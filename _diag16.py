import time
import numpy as np
import jax, jax.numpy as jnp
from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.models.sift import detect_and_describe_sift
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
seq = SyntheticSequence(num_frames=9, h=376, w=1248, n_dots=8000, step=0.4)
imgs8 = jnp.asarray(np.stack([seq.frame(k) for k in range(8)]))

def t(label, f, *args, n=6):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{label:30s} {(time.perf_counter()-t0)/n*1000:8.1f} ms", flush=True)

sc_x = cfg.sift
sc_p = cfg.sift.replace(extrema_impl="pallas")
f_x = jax.jit(jax.vmap(lambda im: detect_and_describe_sift(im, cfg.pyramid, sc_x)))
t("sift b8 xla-extrema", f_x, imgs8)
print("compiling pallas variant...", flush=True)
f_p = jax.jit(jax.vmap(lambda im: detect_and_describe_sift(im, cfg.pyramid, sc_p)))
t("sift b8 pallas-extrema", f_p, imgs8)
# agreement
a = f_x(imgs8); b = f_p(imgs8)
print("valid xla:", int(a.keypoints.valid.sum()), "pallas:", int(b.keypoints.valid.sum()))
