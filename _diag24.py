import time
import numpy as np
from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.slam.tracker import Tracker
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
seq = SyntheticSequence(num_frames=72, h=376, w=1248, n_dots=8000, step=0.4)
frames = np.clip(np.stack([seq.frame(k) for k in range(len(seq))])*255,0,255).astype(np.uint8)
for B in (16, 8):
    warm = Tracker(cfg, seq.info().intrinsics)
    for k in range(0, 24, B):
        warm.process_batch(frames[k:k+B], k)   # compiles B-sized programs
    tr = Tracker(cfg, seq.info().intrinsics)
    tr._frontend_batched = getattr(warm, "_frontend_batched", None)
    tr._track_lite = warm._track_lite
    tr._kf_step = warm._kf_step
    tr.process_batch(frames[:8], 0)
    t0 = time.perf_counter()
    for k in range(8, 72, B):
        tr.process_batch(frames[k:k+B], k)
    dt = time.perf_counter() - t0
    print(f"B={B}: {64/dt:.2f} fps  kfs={sum(f.is_keyframe for f in tr.frames)} lms={int(tr.map.lm_valid.sum())}", flush=True)
