import time
import numpy as np
from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.slam.tracker import Tracker
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
seq = SyntheticSequence(num_frames=56, h=376, w=1248, n_dots=8000, step=0.4)
frames = np.clip(np.stack([seq.frame(k) for k in range(len(seq))])*255,0,255).astype(np.uint8)
tr = Tracker(cfg, seq.info().intrinsics)
tr.process_batch(frames[:8], 0)
t0 = time.perf_counter()
res = []
for k in range(8, 56, 16):
    res += tr.process_batch(frames[k:k+16], k)
dt = time.perf_counter() - t0
print(f"{48/dt:.2f} fps over 48 frames")
print(f"results: {len(res)}  kfs={sum(r.is_keyframe for r in res)}  ok={sum(r.tracking_ok for r in res)}")
print(f"lms={int(tr.map.lm_valid.sum())} reloc={tr.relocalizations}")
for r in res[:20]:
    print(f"f{r.frame_id:3d} m={r.num_matches:4d} inl={r.num_inliers:4d} kf={int(r.is_keyframe)} ok={int(r.tracking_ok)}")
