"""Sharded-BA scaling harness (BASELINE north star: >=0.8 efficiency from
1 host to N hosts).

Measures one LM iteration of the distributed Schur BA at fixed TOTAL problem
size over meshes of 1..N devices and reports parallel efficiency
eff(N) = t(1) / (N * t(N)_per_device_work) — here simply t(1)/t(N) since the
problem is fixed (strong scaling).

On this round's hardware only one real TPU chip exists, so the harness runs
on whatever mesh is available (the 8-virtual-CPU-device mesh in CI — numbers
then validate the code path and communication volume, not silicon scaling).
Run with real multi-host: python -m benchmarks.scaling after
parallel.multihost.initialize().
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def run_scaling(device_counts=None, n_cams: int = 8, lms_per_dev: int = 1024,
                obs_per_lm: int = 4, iters: int = 5) -> dict:
    import jax
    import jax.numpy as jnp

    from visualslam_tpu.backend.ba import BAProblem
    from visualslam_tpu.geometry import se3
    from visualslam_tpu.parallel.dist_ba import run_ba_sharded, shard_problem
    from visualslam_tpu.parallel.mesh import make_mesh
    from visualslam_tpu.utils.config import BAConfig

    n_dev = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16) if d <= n_dev]

    L = lms_per_dev * max(device_counts)
    rng = np.random.default_rng(0)
    X = rng.uniform([-5, -5, 5], [5, 5, 30], (L, 3))
    R = np.stack([np.asarray(se3.exp_so3(jnp.asarray([0.0, 0.02 * c, 0.0])))
                  for c in range(n_cams)])
    t = np.zeros((n_cams, 3), np.float32)
    t[:, 0] = np.arange(n_cams) * 0.2
    lm_idx = np.repeat(np.arange(L), obs_per_lm)
    cam_idx = rng.integers(0, n_cams, len(lm_idx))
    pc = np.einsum("oij,oj->oi", R[cam_idx], X[lm_idx]) + t[cam_idx]
    uv = pc[:, :2] / pc[:, 2:]
    p = BAProblem(
        R=jnp.asarray(R, jnp.float32), t=jnp.asarray(t, jnp.float32),
        X=jnp.asarray(X + rng.normal(0, 0.05, X.shape), jnp.float32),
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        lm_idx=jnp.asarray(lm_idx, jnp.int32),
        uv=jnp.asarray(uv, jnp.float32),
        obs_valid=jnp.ones(len(cam_idx), bool),
        cam_valid=jnp.ones(n_cams, bool), lm_valid=jnp.ones(L, bool))
    cfg = BAConfig(iters=1, max_cameras=n_cams, max_landmarks=L)

    times = {}
    for nd in device_counts:
        mesh = make_mesh(nd, axis="shard")
        sp = shard_problem(p, nd)
        def step():
            return float(run_ba_sharded(sp, cfg, mesh).cost)
        step()  # compile
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            step()
            ts.append(time.perf_counter() - t0)
        times[nd] = float(np.median(ts))
        print(f"[scaling] devices={nd} ba_iter={times[nd] * 1e3:.2f} ms",
              file=sys.stderr)

    base = device_counts[0]
    out = {
        "device_counts": device_counts,
        "ba_iter_ms": {str(k): round(v * 1e3, 3) for k, v in times.items()},
        "efficiency": {str(k): round(times[base] / times[k] / (k / base), 3)
                       for k in device_counts},
        "platform": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    run_scaling()
