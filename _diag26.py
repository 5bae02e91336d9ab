import time
import numpy as np
from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.slam.tracker import Tracker
from visualslam_tpu.slam.evaluation import ate_rmse, centers_from_poses
from visualslam_tpu.utils.config import FAST_CONFIG

seq = SyntheticSequence(num_frames=104, h=376, w=1248, n_dots=8000, step=0.4)
frames = np.clip(np.stack([seq.frame(k) for k in range(len(seq))])*255,0,255).astype(np.uint8)
gt = seq.gt_poses

for gap in (5, 8):
    cfg = FAST_CONFIG.replace(keyframe_max_gap=gap)
    warm = Tracker(cfg, seq.info().intrinsics)
    for k in range(0, 24, 8):
        warm.process_batch(frames[k:k+8], k)
    del warm
    tr = Tracker(cfg, seq.info().intrinsics)
    tr.process_batch(frames[:8], 0)
    t0 = time.perf_counter()
    for k in range(8, 104, 8):
        tr.process_batch(frames[k:k+8], k)
    dt = time.perf_counter() - t0
    traj = tr.trajectory()
    # align scale: monocular; evaluation likely handles? use raw ate on centers with scale alignment
    ate = ate_rmse(centers_from_poses(traj), centers_from_poses(gt[:len(traj)]))
    kfs = sum(f.is_keyframe for f in tr.frames)
    print(f"gap={gap}: {96/dt:.2f} fps kfs={kfs} lms={int(tr.map.lm_valid.sum())} "
          f"ate={ate:.3f} reloc={tr.relocalizations}", flush=True)
