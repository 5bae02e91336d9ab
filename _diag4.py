import time
import numpy as np
import jax
import jax.numpy as jnp

from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.slam.tracker import Tracker
from visualslam_tpu.models.matching import match_features
from visualslam_tpu.backend.pnp import refine_pose
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
seq = SyntheticSequence(num_frames=16, h=376, w=1248, n_dots=8000, step=0.4)
frames = np.stack([seq.frame(k) for k in range(len(seq))])
tr = Tracker(cfg, seq.info().intrinsics)
tr.process_batch(frames[:8], 0)
tr._refresh_device_cache()
fb = tr.detect_batch(frames[8:16])
f0 = tr.features_at(fb, 0)

def t(label, fn, n=10):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{label:34s} {(time.perf_counter()-t0)/n*1000:8.1f} ms")

from visualslam_tpu.slam.track_step import _local_map_features
lf = _local_map_features(tr._lmap)

mj = jax.jit(lambda a, b: match_features(a, b, cfg.match))
t("match local-map (2048x2048)", lambda: mj(lf, f0))

ml = mj(lf, f0)
x_l = jnp.zeros((cfg.match.max_matches, 2))
Xw_l = tr._lmap.X[ml.idx_a]
rp = jax.jit(refine_pose)
t("refine_pose (LM PnP)", lambda: rp(tr._state.R, tr._state.t, Xw_l, x_l, ml.valid))

# matcher pieces
da, db = lf.descriptors, f0.descriptors
va, vb = lf.keypoints.valid, f0.keypoints.valid
def dist_only(da, db):
    from visualslam_tpu.ops.distance import l2sq_distance_matrix
    return l2sq_distance_matrix(da, db)
dj = jax.jit(dist_only)
t("distance matmul only", lambda: dj(da, db))

def with_topk(da, db):
    d = dj(da, db)
    neg2, idx2 = jax.lax.top_k(-d, 2)
    return neg2, idx2
tk = jax.jit(with_topk)
t("dist + top_k(2)", lambda: tk(da, db))

def with_argmin(da, db):
    d = dj(da, db)
    return jnp.argmin(d, axis=0)
am = jax.jit(with_argmin)
t("dist + argmin axis0", lambda: am(da, db))

# frontend stages
from visualslam_tpu.models.pyramid import build_pyramid
from visualslam_tpu.models.sift import detect_and_describe_sift
img = jnp.asarray(frames[8])
bp = jax.jit(lambda im: build_pyramid(im, cfg.pyramid))
t("build_pyramid single", lambda: bp(img))
fe = jax.jit(lambda im: detect_and_describe_sift(im, cfg))
t("full sift single", lambda: fe(img))

fev = jax.jit(jax.vmap(lambda im: detect_and_describe_sift(im, cfg)))
imgs8 = jnp.asarray(frames[8:16])
t("full sift batch8", lambda: fev(imgs8), n=5)
bpv = jax.jit(jax.vmap(lambda im: build_pyramid(im, cfg.pyramid)))
t("build_pyramid batch8", lambda: bpv(imgs8), n=5)
