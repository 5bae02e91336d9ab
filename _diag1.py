import time
import numpy as np

from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.slam.tracker import Tracker
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
seq = SyntheticSequence(num_frames=104, h=376, w=1248, n_dots=8000, step=0.4)
info = seq.info()
t0 = time.perf_counter()
frames = np.stack([seq.frame(k) for k in range(len(seq))])
print(f"render: {time.perf_counter()-t0:.1f}s")

tracker = Tracker(cfg, info.intrinsics)
B = 8
for k in range(0, len(frames), B):
    t0 = time.perf_counter()
    res = tracker.process_batch(frames[k:k + B], k)
    dt = time.perf_counter() - t0
    for r in res:
        print(f"f{r.frame_id:3d} m={r.num_matches:4d} inl={r.num_inliers:4d} "
              f"kf={int(r.is_keyframe)} ok={int(r.tracking_ok)}", flush=True)
    print(f"  batch {k}: {dt:.2f}s  lms={int(tracker.map.lm_valid.sum())} "
          f"kfs={len(tracker.map.kf_order)} reloc={tracker.relocalizations}")
