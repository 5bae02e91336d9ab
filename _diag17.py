import time
import numpy as np
import jax, jax.numpy as jnp
from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.models.pyramid import build_pyramid
from visualslam_tpu.ops.extrema import extrema_mask, gather_cubes, localize, detect_extrema
from visualslam_tpu.utils.masked import block_top_k_select
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
pc, sc = cfg.pyramid, cfg.sift
seq = SyntheticSequence(num_frames=9, h=376, w=1248, n_dots=8000, step=0.4)
imgs8 = jnp.asarray(np.stack([seq.frame(k) for k in range(8)]))

def t(label, f, *args, n=6):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{label:30s} {(time.perf_counter()-t0)/n*1000:8.1f} ms", flush=True)

f_pyr = jax.jit(jax.vmap(lambda im: build_pyramid(im, pc)))
t("pyramid b8", f_pyr, imgs8)

def mask_only(im):
    ss = build_pyramid(im, pc)
    return [extrema_mask(ss.dog[o]) for o in range(pc.num_octaves)]
t("pyr+mask b8", jax.jit(jax.vmap(mask_only)), imgs8)

def with_topk(im):
    ss = build_pyramid(im, pc)
    outs = []
    for o in range(pc.num_octaves):
        dog = ss.dog[o]
        m = extrema_mask(dog)
        score = jnp.abs(dog)
        m &= score > 0.5*sc.contrast_threshold
        outs.append(block_top_k_select(score.reshape(-1), m.reshape(-1), sc.octave_capacity(o)))
    return outs
t("pyr+mask+topk b8", jax.jit(jax.vmap(with_topk)), imgs8)

def full(im):
    ss = build_pyramid(im, pc)
    return [detect_extrema(ss.dog[o], sc, capacity=sc.octave_capacity(o)) for o in range(pc.num_octaves)]
t("pyr+extrema full b8", jax.jit(jax.vmap(full)), imgs8)

# upload overlap test
frames_u8 = [np.random.default_rng(i).integers(0,256,(8,376,1248),dtype=np.uint8) for i in range(4)]
fe = jax.jit(jax.vmap(lambda im: build_pyramid(im.astype(jnp.float32)/255.0, pc)))
x = jax.device_put(frames_u8[0]); jax.block_until_ready(x)
t0 = time.perf_counter()
for i in range(4):
    _ = jax.device_put(frames_u8[i])
jax.block_until_ready(_)
print(f"upload u8 batch8: {(time.perf_counter()-t0)/4*1000:.1f} ms", flush=True)
# overlapped: dispatch compute then upload next
y = fe(x); jax.block_until_ready(y)
t0 = time.perf_counter()
h = jax.device_put(frames_u8[1])
y = fe(x)
h2 = jax.device_put(frames_u8[2])
jax.block_until_ready((y, h, h2))
print(f"2 uploads + 1 pyr overlapped: {(time.perf_counter()-t0)*1000:.1f} ms", flush=True)
