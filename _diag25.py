import time
import numpy as np
from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.slam.tracker import Tracker
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
seq = SyntheticSequence(num_frames=104, h=376, w=1248, n_dots=8000, step=0.4)
frames = np.clip(np.stack([seq.frame(k) for k in range(len(seq))])*255,0,255).astype(np.uint8)
warm = Tracker(cfg, seq.info().intrinsics)
for k in range(0, 24, 8):
    warm.process_batch(frames[k:k+8], k)
del warm
tr = Tracker(cfg, seq.info().intrinsics)
t0 = time.perf_counter()
for k in range(8, 104, 8):
    tb = time.perf_counter()
    tr.process_batch(frames[k:k+8], k)
    print(f"batch {k:3d}: {(time.perf_counter()-tb)*1000:6.0f} ms  kfs={len(tr.map.kf_order)} lc_entries={len(tr.loop_closer.entries) if tr.loop_closer else 0}", flush=True)
# init region
tb = time.perf_counter()
tr2 = Tracker(cfg, seq.info().intrinsics)
tr2.process_batch(frames[:8], 0)
print(f"init batch (bootstrap+two-view): {(time.perf_counter()-tb)*1000:.0f} ms")
dt = time.perf_counter() - t0
print(f"{96/dt:.2f} fps")
