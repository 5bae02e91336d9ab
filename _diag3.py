import time
import numpy as np
import jax
import jax.numpy as jnp

from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.slam.tracker import Tracker
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
seq = SyntheticSequence(num_frames=24, h=376, w=1248, n_dots=8000, step=0.4)
info = seq.info()
frames = np.stack([seq.frame(k) for k in range(len(seq))])

tr = Tracker(cfg, info.intrinsics)
tr.process_batch(frames[:8], 0)  # warmup: compiles everything

def t(label, fn, n=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{label:30s} {(time.perf_counter()-t0)/n*1000:8.1f} ms")

imgs = jnp.asarray(frames[8:16])
t("frontend batch8 (dispatch+run)", lambda: tr.detect_batch(frames[8:16]))
fb = tr.detect_batch(frames[8:16])
f0 = tr.features_at(fb, 0)

tr._refresh_device_cache()
t("track_step x1", lambda: tr._track_step(tr._kf_ref, tr._lmap, f0,
                                          tr._state, tr.intr))
out = tr._track_step(tr._kf_ref, tr._lmap, f0, tr._state, tr.intr)
t("stats readback", lambda: jax.device_get(out.stats))
t("full TrackOut device_get", lambda: jax.device_get(out), n=3)
t("refresh_device_cache", lambda: tr._refresh_device_cache(), n=3)

# BA dispatch+wait
import copy
t0 = time.perf_counter()
tr._run_window_ba()
print(f"run_window_ba dispatch         {(time.perf_counter()-t0)*1000:8.1f} ms")
t0 = time.perf_counter()
tr._flush_pending_ba()
print(f"flush_pending_ba (wait)        {(time.perf_counter()-t0)*1000:8.1f} ms")

if tr.loop_closer is not None:
    t0 = time.perf_counter()
    idx = tr.loop_closer.add_keyframe(
        99, tr.map.kf_R[0], tr.map.kf_t[0], f0,
        tr.map.kf_kp_lm[tr.map.last_keyframe_slot()], tr.map.X)
    print(f"loop_closer.add_keyframe       {(time.perf_counter()-t0)*1000:8.1f} ms")
    t0 = time.perf_counter()
    e = tr.loop_closer.detect(idx)
    print(f"loop_closer.detect             {(time.perf_counter()-t0)*1000:8.1f} ms")
