import time
import numpy as np
import jax, jax.numpy as jnp
from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.slam.tracker import Tracker
from visualslam_tpu.slam.track_step import TrackState
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
seq = SyntheticSequence(num_frames=24, h=376, w=1248, n_dots=8000, step=0.4)
frames = np.stack([seq.frame(k) for k in range(len(seq))])
tr = Tracker(cfg, seq.info().intrinsics)
tr.process_batch(frames[:8], 0)
tr._refresh_device_cache()
fb = tr.detect_batch(frames[8:24])
feats = [tr.features_at(fb, i) for i in range(16)]

# warm
out = tr._track_step(tr._kf_ref, tr._lmap, feats[0], tr._state, tr.intr)
jax.block_until_ready(out)

# pipelined: 16 distinct frames, chained state, block once
t0 = time.perf_counter()
st = tr._state
outs = []
for i in range(16):
    o = tr._track_step(tr._kf_ref, tr._lmap, feats[i], st, tr.intr)
    st = TrackState(R=o.R, t=o.t, vel=o.vel)
    outs.append(o)
stats = jax.device_get([o.stats for o in outs])
print(f"pipelined 16 frames: {(time.perf_counter()-t0)/16*1000:.1f} ms/frame")

# per-call blocked
t0 = time.perf_counter()
st = tr._state
for i in range(16):
    o = tr._track_step(tr._kf_ref, tr._lmap, feats[i], st, tr.intr)
    st = TrackState(R=o.R, t=o.t, vel=o.vel)
    jax.block_until_ready(o)
print(f"blocked   16 frames: {(time.perf_counter()-t0)/16*1000:.1f} ms/frame")

# stats-only variant cost: device_get of stats each frame
t0 = time.perf_counter()
st = tr._state
for i in range(16):
    o = tr._track_step(tr._kf_ref, tr._lmap, feats[i], st, tr.intr)
    st = TrackState(R=o.R, t=o.t, vel=o.vel)
    _ = np.asarray(o.stats)
print(f"stats-rb  16 frames: {(time.perf_counter()-t0)/16*1000:.1f} ms/frame")
