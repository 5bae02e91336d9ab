import time
import numpy as np, jax, jax.numpy as jnp
from visualslam_tpu.frontend import detect_and_describe
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
B, H, W = 16, 376, 1248
rng = np.random.default_rng(0)
REPS = 6
bufs = [jnp.asarray(rng.random((B, H, W), dtype=np.float32)) for _ in range(2 + REPS)]

def fps(cfg, tag):
    f = jax.jit(lambda ims: jnp.sum(jax.vmap(
        lambda im: detect_and_describe(im, cfg))(ims).descriptors)
        + jnp.sum(jax.vmap(lambda im: detect_and_describe(im, cfg))(ims).keypoints.yx))
    for i in range(2):
        float(f(bufs[i]))
    ts = []
    for i in range(REPS):
        t0 = time.perf_counter(); float(f(bufs[2+i])); ts.append(time.perf_counter()-t0)
    ms = float(np.median(ts))*1e3/B
    print(f"{tag}: {ms:.3f} ms/frame = {1000/ms:.1f} fps")
    return ms

m_b = fps(cfg, "bf16-patches (FAST default)")
m_f = fps(cfg.replace(sift=cfg.sift.replace(hist_compute="f32")), "f32-patches")

# accuracy probe: descriptors bf16 vs f32 on one frame
fa = jax.jit(lambda im: detect_and_describe(im, cfg))
fb = jax.jit(lambda im: detect_and_describe(
    im, cfg.replace(sift=cfg.sift.replace(hist_compute="f32"))))
ra, rb = fa(bufs[0][0]), fb(bufs[0][0])
va = np.asarray(ra.keypoints.valid); vb = np.asarray(rb.keypoints.valid)
ya = np.asarray(ra.keypoints.yx)[va]; yb = np.asarray(rb.keypoints.yx)[vb]
d = np.linalg.norm(ya[:, None] - yb[None], axis=-1)
match = d.min(axis=1) < 0.5
overlap = match.mean()
j = d.argmin(axis=1)
da = np.asarray(ra.descriptors)[va][match]
db = np.asarray(rb.descriptors)[vb][j[match]]
cos = np.sum(da*db, -1) / np.maximum(np.linalg.norm(da,axis=-1)*np.linalg.norm(db,axis=-1), 1e-9)
print(f"kp overlap {overlap:.3f}, desc cosine mean {cos.mean():.5f} min {cos.min():.4f}")
