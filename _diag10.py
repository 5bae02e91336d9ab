import time
import numpy as np
import jax, jax.numpy as jnp
from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.slam.tracker import Tracker
from visualslam_tpu.backend.ba import BAProblem, run_ba_jit
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
seq = SyntheticSequence(num_frames=24, h=376, w=1248, n_dots=8000, step=0.4)
frames = np.stack([seq.frame(k) for k in range(len(seq))])
tr = Tracker(cfg, seq.info().intrinsics)
tr.process_batch(frames[:24], 0)
tr._flush_pending_ba()

bacfg = cfg.ba
t0 = time.perf_counter()
arrs = tr.map.build_ba_arrays(bacfg.max_observations)
print(f"build_ba_arrays      {(time.perf_counter()-t0)*1000:8.1f} ms")
(slots, R, t, lm_slots, X, cam_idx, lm_idx, uv, valid) = arrs
C, L = bacfg.max_cameras, bacfg.max_landmarks
nC, nL = len(slots), len(lm_slots)
t0 = time.perf_counter()
p = BAProblem(
    R=jnp.asarray(np.concatenate([R, np.tile(np.eye(3, dtype=np.float32), (C-nC,1,1))])),
    t=jnp.asarray(np.concatenate([t, np.zeros((C-nC,3),np.float32)])),
    X=jnp.asarray(np.concatenate([X, np.zeros((L-nL,3),np.float32)])),
    cam_idx=jnp.asarray(cam_idx, jnp.int32), lm_idx=jnp.asarray(lm_idx, jnp.int32),
    uv=jnp.asarray(uv, jnp.float32), obs_valid=jnp.asarray(valid),
    cam_valid=jnp.asarray(np.arange(C)<nC), lm_valid=jnp.asarray(np.arange(L)<nL))
jax.block_until_ready(p)
print(f"upload problem       {(time.perf_counter()-t0)*1000:8.1f} ms")
t0 = time.perf_counter()
res = run_ba_jit(p, bacfg)
print(f"run_ba_jit dispatch  {(time.perf_counter()-t0)*1000:8.1f} ms")
t0 = time.perf_counter()
jax.block_until_ready(res)
print(f"run_ba device wait   {(time.perf_counter()-t0)*1000:8.1f} ms")
t0 = time.perf_counter()
res2 = run_ba_jit(p, bacfg); jax.block_until_ready(res2)
print(f"run_ba #2 e2e        {(time.perf_counter()-t0)*1000:8.1f} ms")
# full _run_window_ba as the tracker does it
t0 = time.perf_counter()
tr._run_window_ba()
print(f"_run_window_ba       {(time.perf_counter()-t0)*1000:8.1f} ms")
t0 = time.perf_counter()
tr._flush_pending_ba()
print(f"flush                {(time.perf_counter()-t0)*1000:8.1f} ms")
