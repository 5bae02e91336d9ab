import time
import numpy as np
import jax
import jax.numpy as jnp

from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.slam.tracker import Tracker
from visualslam_tpu.geometry.epipolar import triangulate
from visualslam_tpu.models.sift import detect_and_describe_sift
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
seq = SyntheticSequence(num_frames=16, h=376, w=1248, n_dots=8000, step=0.4)
frames = np.stack([seq.frame(k) for k in range(len(seq))])
tr = Tracker(cfg, seq.info().intrinsics)
tr.process_batch(frames[:8], 0)
tr._refresh_device_cache()
fb = tr.detect_batch(frames[8:16])
f0 = tr.features_at(fb, 0)

def t(label, fn, n=10):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{label:34s} {(time.perf_counter()-t0)/n*1000:8.1f} ms", flush=True)

x1 = jnp.asarray(np.random.randn(1024, 2).astype(np.float32) * 0.1)
x2 = x1 + 0.01
R = jnp.eye(3)
tt = jnp.asarray([0.1, 0.0, 0.0])
tri = jax.jit(triangulate)
t("triangulate 1024 (eigh)", lambda: tri(R, tt, x1, x2))

fe = jax.jit(lambda im: detect_and_describe_sift(im, cfg.pyramid, cfg.sift))
img = jnp.asarray(frames[8])
t("full sift single", lambda: fe(img))
imgs8 = jnp.asarray(frames[8:16])
fev = jax.jit(jax.vmap(lambda im: detect_and_describe_sift(im, cfg.pyramid, cfg.sift)))
t("full sift batch8", lambda: fev(imgs8), n=5)

# track_step again to confirm
t("track_step x1", lambda: tr._track_step(tr._kf_ref, tr._lmap, f0, tr._state, tr.intr))

# BA dispatch repeat (warm)
t0 = time.perf_counter()
tr._run_window_ba()
print(f"run_window_ba #2 dispatch        {(time.perf_counter()-t0)*1000:8.1f} ms")
t0 = time.perf_counter()
tr._flush_pending_ba()
print(f"flush #2                          {(time.perf_counter()-t0)*1000:8.1f} ms")
t0 = time.perf_counter()
tr._run_window_ba()
print(f"run_window_ba #3 dispatch        {(time.perf_counter()-t0)*1000:8.1f} ms")

# what's slow inside: build_ba_arrays?
t0 = time.perf_counter()
arrs = tr.map.build_ba_arrays(cfg.ba.max_observations)
print(f"build_ba_arrays                   {(time.perf_counter()-t0)*1000:8.1f} ms")
