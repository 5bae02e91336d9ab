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


def run_traj_scaling(device_counts=None, cams_per_dev: int = 4,
                     lms_per_cam: int = 256, obs_per_lm: int = 6,
                     iters: int = 5) -> dict:
    """WEAK scaling of the trajectory-sharded BA (parallel/traj_ba.py):
    the keyframe window GROWS with the device count (cams_per_dev per
    device) — the long-context analogue where more chips buy a longer
    optimized trajectory at ~constant per-device time."""
    import jax
    import jax.numpy as jnp

    from visualslam_tpu.backend.ba import BAProblem
    from visualslam_tpu.geometry import se3
    from visualslam_tpu.parallel.mesh import make_mesh
    from visualslam_tpu.parallel.traj_ba import (
        run_ba_traj_sharded,
        shard_problem_trajectory,
    )
    from visualslam_tpu.utils.config import BAConfig

    n_dev = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16) if d <= n_dev]

    rng = np.random.default_rng(0)
    times = {}
    for nd in device_counts:
        C = cams_per_dev * nd
        L = lms_per_cam * C
        X = rng.uniform([-5, -5, 5], [5, 5, 30], (L, 3))
        R = np.stack([np.asarray(se3.exp_so3(jnp.asarray(
            [0.0, 0.01 * c, 0.0]))) for c in range(C)])
        t = np.zeros((C, 3), np.float32)
        t[:, 0] = np.arange(C) * 0.2
        lm_idx = np.repeat(np.arange(L), obs_per_lm)
        # covisibility-local observations: each landmark is seen by a
        # window of nearby cameras (the structure the partition exploits)
        anchor = np.repeat(np.arange(L) * C // L, obs_per_lm)
        cam_idx = np.clip(anchor + rng.integers(-2, 3, len(lm_idx)),
                          0, C - 1)
        pc = np.einsum("oij,oj->oi", R[cam_idx], X[lm_idx]) + t[cam_idx]
        uv = pc[:, :2] / pc[:, 2:]
        p = BAProblem(
            R=jnp.asarray(R, jnp.float32), t=jnp.asarray(t, jnp.float32),
            X=jnp.asarray(X + rng.normal(0, 0.05, X.shape), jnp.float32),
            cam_idx=jnp.asarray(cam_idx, jnp.int32),
            lm_idx=jnp.asarray(lm_idx, jnp.int32),
            uv=jnp.asarray(uv, jnp.float32),
            obs_valid=jnp.ones(len(cam_idx), bool),
            cam_valid=jnp.ones(C, bool), lm_valid=jnp.ones(L, bool))
        cfg = BAConfig(iters=1, cg_iters=32, max_cameras=C,
                       max_landmarks=L)
        mesh = make_mesh(nd, axis="shard")
        sp = shard_problem_trajectory(p, nd)

        def step():
            return float(run_ba_traj_sharded(sp, cfg, mesh).cost)
        step()
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            step()
            ts.append(time.perf_counter() - t0)
        times[nd] = float(np.median(ts))
        print(f"[traj-scaling] devices={nd} C={C} L={L} "
              f"ba_iter={times[nd] * 1e3:.2f} ms", file=sys.stderr)

    base = device_counts[0]
    out = {
        "mode": "weak-scaling (trajectory grows with devices)",
        "device_counts": device_counts,
        "cams_per_dev": cams_per_dev,
        "ba_iter_ms": {str(k): round(v * 1e3, 3) for k, v in times.items()},
        # weak scaling: efficiency = t(1) / t(N) at N x the problem size
        "weak_efficiency": {str(k): round(times[base] / times[k], 3)
                            for k in device_counts},
        "platform": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    return out


def main(argv=None):
    import argparse
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0, metavar="N",
                    help="force the CPU backend with N virtual devices "
                         "(the env pins the TPU platform; a plain env var "
                         "cannot override it)")
    args = ap.parse_args(argv)
    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}").strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax as _jax

    purpose = (
        "CORRECTNESS/COMPILE VALIDATION ONLY on this platform — virtual "
        "CPU 'devices' share one socket, so wall-times here measure host "
        "contention, not interconnect scaling. Performance evidence for "
        "multi-chip lives in benchmarks/scaling.md (measured collective "
        "volumes + analytic ICI projection)."
        if _jax.default_backend() == "cpu" else
        "measured on real devices")
    res = {"purpose": purpose,
           "landmark_sharded_strong": run_scaling(),
           "trajectory_sharded_weak": run_traj_scaling()}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scaling.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=2)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
