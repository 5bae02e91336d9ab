import time
import numpy as np
import jax
import jax.numpy as jnp
from visualslam_tpu.geometry.epipolar import triangulate
from visualslam_tpu.backend.pnp import refine_pose
from visualslam_tpu.models.matching import match_features
from visualslam_tpu.models.types import Features, Keypoints
from visualslam_tpu.geometry import se3
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
rng = np.random.default_rng(0)

def t(label, fn, *args, n=20):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{label:32s} {(time.perf_counter()-t0)/n*1000:8.2f} ms", flush=True)

x1 = jnp.asarray(rng.normal(size=(1024,2)).astype(np.float32)*0.1)
x2 = x1 + 0.01
R = jnp.eye(3); tt = jnp.asarray([0.1,0.,0.])
t("triangulate 1024 (eigh)", triangulate, R, tt, x1, x2)

X = jnp.asarray(rng.normal(size=(2048,3)).astype(np.float32)*5 + np.array([0,0,20],np.float32))
uv = X[:,:2]/X[:,2:]
val = jnp.ones(2048, bool)
t("refine_pose 2048", refine_pose, R, tt, X, uv, val)

def mkfeat(k, seed):
    d = rng.normal(size=(k,128)).astype(np.float32)
    kps = Keypoints.empty(k)._replace(yx=jnp.asarray(rng.random((k,2)).astype(np.float32)*300), valid=jnp.ones(k,bool))
    return Features(kps, jnp.asarray(d))
fa, fb = mkfeat(2048,1), mkfeat(2048,2)
t("match 2048x2048", lambda a,b: match_features(a,b,cfg.match), fa, fb)
t("se3 exp/log/compose", lambda v: se3.se3_log(*se3.compose(*se3.se3_exp(v), *se3.inverse(*se3.se3_exp(v*0.5)))), jnp.ones(6)*0.01)
