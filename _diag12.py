import time
import numpy as np
import jax
from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.slam.tracker import Tracker
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
seq = SyntheticSequence(num_frames=40, h=376, w=1248, n_dots=8000, step=0.4)
frames = np.stack([seq.frame(k) for k in range(len(seq))])
tr = Tracker(cfg, seq.info().intrinsics)
tr.process_batch(frames[:8], 0)

orig_flush = tr._flush_pending_ba.__func__
def flush(self):
    if self._pending_ba is None:
        return
    slots, fids, lm_slots, uids, nC, nL, res = self._pending_ba
    t0 = time.perf_counter()
    jax.block_until_ready(res.R)
    t1 = time.perf_counter()
    self._pending_ba = (slots, fids, lm_slots, uids, nC, nL, res)
    orig_flush(self)
    t2 = time.perf_counter()
    print(f"  flush: wait={1000*(t1-t0):.0f}ms readback+apply={1000*(t2-t1):.0f}ms", flush=True)
import types
tr._flush_pending_ba = types.MethodType(flush, tr)

for k in range(8, 40, 8):
    t0 = time.perf_counter()
    tr.process_batch(frames[k:k+8], k)
    print(f"batch {k}: {time.perf_counter()-t0:.2f}s", flush=True)
