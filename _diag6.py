import time
import logging
import numpy as np
import jax

jax.config.update("jax_log_compiles", True)
logging.getLogger("jax").setLevel(logging.WARNING)
logging.getLogger("jax._src.interpreters.pxla").setLevel(logging.INFO)
logging.getLogger("jax._src.dispatch").setLevel(logging.INFO)
logging.basicConfig(level=logging.INFO)

from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.slam.tracker import Tracker
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
seq = SyntheticSequence(num_frames=16, h=376, w=1248, n_dots=8000, step=0.4)
frames = np.stack([seq.frame(k) for k in range(len(seq))])
tr = Tracker(cfg, seq.info().intrinsics)
print("=== warmup", flush=True)
tr.process_batch(frames[:8], 0)
print("=== ba #2", flush=True)
t0 = time.perf_counter()
tr._run_window_ba()
print(f"ba#2 {time.perf_counter()-t0:.2f}s", flush=True)
print("=== ba #3", flush=True)
t0 = time.perf_counter()
tr._run_window_ba()
print(f"ba#3 {time.perf_counter()-t0:.2f}s", flush=True)
