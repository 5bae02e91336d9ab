import time, json, numpy as np, jax, jax.numpy as jnp
from visualslam_tpu.frontend import detect_and_describe
from visualslam_tpu.utils.config import FAST_CONFIG
h, w = 376, 1248
def make(b, seed):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.integers(0, 256, (b, h, w), dtype=np.uint8))
def run(cfg, tag, seedbase):
    def fn(ims):
        f = jax.vmap(lambda im: detect_and_describe(im, cfg))(ims)
        return jnp.sum(f.descriptors) + jnp.sum(f.keypoints.yx) + jnp.sum(f.keypoints.response)
    sizes = (8, 24); comp = {}
    for b in sizes:
        comp[b] = jax.jit(fn).lower(make(b, 0)).compile()
        float(comp[b](make(b, 1)))
    times = {}
    for b in sizes:
        ts = []
        for k in range(5):
            x = make(b, seedbase + k); x.block_until_ready()
            t0 = time.perf_counter(); float(comp[b](x)); ts.append(time.perf_counter() - t0)
        times[b] = min(ts)
    ms = (times[24] - times[8]) / 16 * 1e3
    print(f"{tag}: {ms:.3f} ms/frame")
    return ms
xla = run(FAST_CONFIG, "patch_impl=xla   ", 700)
pal = run(FAST_CONFIG.replace(sift=FAST_CONFIG.sift.replace(patch_impl="pallas")), "patch_impl=pallas", 900)
print(json.dumps({"xla_ms_per_frame": round(xla,3), "pallas_ms_per_frame": round(pal,3), "speedup": round(xla/pal,3)}))
