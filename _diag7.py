import time
import numpy as np
import jax
import jax.numpy as jnp

from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.models.pyramid import build_pyramid
from visualslam_tpu.models.sift import (_orientation_pass, describe_octave,
                                        detect_and_describe_sift)
from visualslam_tpu.models.orb import detect_and_describe_orb
from visualslam_tpu.ops.extrema import detect_extrema
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
seq = SyntheticSequence(num_frames=9, h=376, w=1248, n_dots=8000, step=0.4)
frames = np.stack([seq.frame(k) for k in range(len(seq))])
imgs8 = jnp.asarray(frames[:8])
img = imgs8[0]

def t(label, fn, n=10):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{label:34s} {(time.perf_counter()-t0)/n*1000:8.1f} ms", flush=True)

B = 8
# upload cost
t("device_put batch8 (15MB)", lambda: jax.device_put(frames[:8]), n=5)

pc, sc = cfg.pyramid, cfg.sift
t("pyramid b8", lambda: jax.jit(jax.vmap(lambda im: build_pyramid(im, pc)))(imgs8), n=5)

def upto_extrema(im):
    ss = build_pyramid(im, pc)
    outs = [detect_extrema(ss.dog[o], sc) for o in range(pc.num_octaves)]
    return jax.tree_util.tree_map(lambda *x: jnp.stack(x), *outs)
t("pyr+extrema b8", lambda: jax.jit(jax.vmap(upto_extrema))(imgs8), n=5)

def upto_orient(im):
    ss = build_pyramid(im, pc)
    res = []
    for o in range(pc.num_octaves):
        lvl, y, x, off, r, v = detect_extrema(ss.dog[o], sc)
        res.append(_orientation_pass(ss, o, lvl, y, x, off, r, v, pc, sc))
    return res
t("pyr+extrema+orient b8", lambda: jax.jit(jax.vmap(upto_orient))(imgs8), n=5)

t("full sift b8", lambda: jax.jit(jax.vmap(
    lambda im: detect_and_describe_sift(im, pc, sc)))(imgs8), n=5)

t("full orb b8", lambda: jax.jit(jax.vmap(
    lambda im: detect_and_describe_orb(im, cfg.orb)))(imgs8), n=5)
