import time
import numpy as np
import jax
from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.slam import tracker as trmod
from visualslam_tpu.slam.tracker import Tracker
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
seq = SyntheticSequence(num_frames=40, h=376, w=1248, n_dots=8000, step=0.4)
frames = np.clip(np.stack([seq.frame(k) for k in range(len(seq))])*255,0,255).astype(np.uint8)

# monkeypatch timers
times = {}
def wrap(obj, name):
    orig = getattr(obj, name)
    def f(*a, **kw):
        t0 = time.perf_counter()
        r = orig(*a, **kw)
        times.setdefault(name, []).append(time.perf_counter() - t0)
        return r
    setattr(obj, name, f)

tr = Tracker(cfg, seq.info().intrinsics)
tr.process_batch(frames[:8], 0)  # warmup
for n in ["detect_batch", "_run_window_ba", "_flush_pending_ba",
          "_refresh_device_cache", "_insert_keyframe_from_track",
          "_commit_tracked_frame", "_track_lite", "_kf_step"]:
    wrap(tr, n)
wrap(tr.loop_closer, "add_keyframe")
wrap(tr.loop_closer, "detect")

t0 = time.perf_counter()
for k in range(8, 40, 8):
    tb0 = time.perf_counter()
    tr.process_batch(frames[k:k+8], k)
    print(f"batch {k}: {time.perf_counter()-tb0:.2f}s", flush=True)
total = time.perf_counter() - t0
print(f"total {total:.2f}s for 32 frames = {32/total:.2f} fps")
for n, v in sorted(times.items(), key=lambda kv: -sum(kv[1])):
    print(f"{n:28s} n={len(v):3d} total={sum(v)*1000:8.1f} ms mean={np.mean(v)*1000:7.1f}")
