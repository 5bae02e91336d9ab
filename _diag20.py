import time
import numpy as np
import jax, jax.numpy as jnp
from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.slam.tracker import Tracker
from visualslam_tpu.slam import track_step as tsmod
from visualslam_tpu.models.matching import match_features
from visualslam_tpu.models.types import Features, Keypoints
from visualslam_tpu.backend.pnp import refine_pose
from visualslam_tpu.geometry.camera import normalized
from visualslam_tpu.geometry import se3
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
seq = SyntheticSequence(num_frames=24, h=376, w=1248, n_dots=8000, step=0.4)
frames = np.clip(np.stack([seq.frame(k) for k in range(len(seq))])*255,0,255).astype(np.uint8)
tr = Tracker(cfg, seq.info().intrinsics)
tr.process_batch(frames[:16], 0)
tr._refresh_device_cache()
fb = tr.detect_batch(frames[16:24])
f0 = tr.features_at(fb, 0)
kf, lmap, st, intr = tr._kf_ref, tr._lmap, tr._state, tr.intr

def t(label, f, *args, n=16):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{label:30s} {(time.perf_counter()-t0)/n*1000:8.2f} ms", flush=True)

def lite(kf, lmap, feats, state, intr):
    ml = match_features(tsmod._local_map_features(lmap), feats, cfg.match)
    uv_l = feats.keypoints.yx[ml.idx_b][:, ::-1]
    x_l = normalized(uv_l, intr)
    Xw_l = lmap.X[ml.idx_a]
    dR, dt = se3.se3_exp(state.vel)
    R0 = dR @ state.R
    t0 = dR @ state.t + dt
    Xc_l = Xw_l @ R0.T + t0
    z_l = Xc_l[:, 2]
    proj_l = Xc_l[:, :2] / jnp.maximum(z_l[:, None], 1e-6)
    gate = (z_l > 1e-3) & (jnp.linalg.norm(proj_l - x_l, axis=-1) < cfg.track_gate)
    ml_gated = ml.valid & gate
    pr = refine_pose(R0, t0, Xw_l, x_l, ml_gated)
    return pr.R, pr.t, pr.num_inliers

def match_only(lmap, feats):
    return match_features(tsmod._local_map_features(lmap), feats, cfg.match)

t("match only", jax.jit(match_only), lmap, f0)
t("lite (match+pnp)", jax.jit(lite), kf, lmap, f0, st, intr)
t("full track_step", tr._track_step, kf, lmap, f0, st, intr)
