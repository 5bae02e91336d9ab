import time, numpy as np, jax, jax.numpy as jnp
from visualslam_tpu.models.pyramid import build_pyramid
from visualslam_tpu.models.sift import _orientation_pass, describe_octave
from visualslam_tpu.ops.extrema import detect_extrema
from visualslam_tpu.ops.patches import crop_patches
from visualslam_tpu.utils.config import FAST_CONFIG
cfg = FAST_CONFIG
pc, sc = cfg.pyramid, cfg.sift
h, w = 376, 1248
def make(b, seed):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.integers(0, 256, (b, h, w), dtype=np.uint8))

def upto(stage):
    def one(img):
        img = img.astype(jnp.float32) / 255.0
        ss = build_pyramid(img, pc)
        acc = sum(jnp.sum(d) for d in ss.dog)
        if stage == "pyramid":
            return acc
        outs = []
        for o in range(pc.num_octaves):
            lvl, y, x, off, resp, valid = detect_extrema(ss.dog[o], sc, capacity=sc.octave_capacity(o))
            if stage == "detect":
                outs.append(jnp.sum(resp) + jnp.sum(y))
                continue
            mag_ori = jnp.stack([ss.grad_mag[o], ss.grad_ori[o]], axis=-1)
            glvl = lvl - ss.grad_level_offset
            yx_int = jnp.stack([y, x], -1).astype(jnp.float32)
            patches, py0, px0 = crop_patches(mag_ori, glvl, yx_int, 28)
            if stage == "crop":
                outs.append(jnp.sum(patches))
                continue
            kps, ci = _orientation_pass(patches, py0, px0, lvl, y, x, off, resp, valid, pc, sc)
            if stage == "orient":
                outs.append(jnp.sum(kps.orientation) + jnp.sum(kps.response))
                continue
            desc = describe_octave(patches, py0, px0, ci, kps, sc)
            outs.append(jnp.sum(desc) + jnp.sum(kps.response))
        return acc + sum(outs)
    def fn(ims):
        return jnp.sum(jax.vmap(one)(ims))
    return fn

sizes = (8, 24)
prev = 0.0
for stage in ["pyramid", "detect", "crop", "orient", "describe"]:
    comp = {}
    for b in sizes:
        comp[b] = jax.jit(upto(stage)).lower(make(b, 0)).compile()
        float(comp[b](make(b, 1)))
    times = {}
    for b in sizes:
        ts = []
        for k in range(5):
            x = make(b, 300 + k); x.block_until_ready()
            t0 = time.perf_counter(); float(comp[b](x)); ts.append(time.perf_counter() - t0)
        times[b] = min(ts)
    ms = (times[24] - times[8]) / 16 * 1e3
    print(f"{stage:10s} cumulative {ms:7.3f} ms/frame   delta {ms - prev:+7.3f}")
    prev = ms
