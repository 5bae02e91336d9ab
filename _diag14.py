import time, types
import numpy as np
import jax
from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.slam.tracker import Tracker
from visualslam_tpu.slam.track_step import TrackAssoc
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
seq = SyntheticSequence(num_frames=40, h=376, w=1248, n_dots=8000, step=0.4)
frames = np.clip(np.stack([seq.frame(k) for k in range(len(seq))])*255,0,255).astype(np.uint8)
tr = Tracker(cfg, seq.info().intrinsics)
tr.process_batch(frames[:8], 0)

def insert(self, feats, frame_id, R, t, out):
    T = {}; t0 = time.perf_counter()
    def lap(name):
        nonlocal t0
        t1 = time.perf_counter(); T[name] = (t1-t0)*1000; t0 = t1
    d = TrackAssoc.unpack(*jax.device_get((out.assoc_i, out.assoc_f)))
    lap("assoc device_get")
    prev_kf = self.map.last_keyframe_slot()
    slot = self._new_keyframe(feats, frame_id, R, t)
    lap("_new_keyframe")
    lm_ids = self._lmap_ids[np.maximum(d.lm_slot, 0)]
    tracked = d.lm_valid & d.lm_inlier & (lm_ids >= 0)
    if tracked.any():
        self.map.add_observations(slot, lm_ids[tracked], d.lm_x[tracked])
        self.map.kf_kp_lm[slot][d.lm_kp[tracked]] = lm_ids[tracked]
    good = np.asarray(d.tri_good)
    if good.any():
        lm_idx = self.map.allocate_landmarks(d.tri_X[good])
        self.map.add_observations(prev_kf, lm_idx, d.m_x1[good])
        self.map.add_observations(slot, lm_idx, d.m_x2[good])
        self.map.kf_kp_lm[prev_kf][d.m_idx_a[good]] = lm_idx
        self.map.kf_kp_lm[slot][d.m_idx_b[good]] = lm_idx
    lap("map updates")
    if self.run_ba:
        self._run_window_ba()
    lap("window_ba")
    self._last_R = self.map.kf_R[slot].copy(); self._last_t = self.map.kf_t[slot].copy()
    if self.loop_closer is not None:
        idx = self.loop_closer.add_keyframe(frame_id, self.map.kf_R[slot], self.map.kf_t[slot], feats, self.map.kf_kp_lm[slot], self.map.X)
        lap("lc add_keyframe")
        edge = self.loop_closer.detect(idx)
        lap("lc detect")
        if edge is not None:
            self.num_loop_closures += 1
            self.loop_closer.optimize()
            self._apply_loop_correction(slot, idx)
    self._refresh_device_cache()
    lap("refresh")
    print("  " + "  ".join(f"{k}={v:.0f}" for k,v in T.items()), flush=True)
tr._insert_keyframe_from_track = types.MethodType(insert, tr)

for k in range(8, 40, 8):
    t0 = time.perf_counter()
    tr.process_batch(frames[k:k+8], k)
    print(f"batch {k}: {time.perf_counter()-t0:.2f}s", flush=True)
