"""Multi-chip dry run: compile + execute the distributed pipeline on an
n-device mesh with tiny shapes (driven by __graft_entry__.dryrun_multichip).

Exercises BOTH distributed paths on the same mesh:
  1. data-parallel SIFT frontend (shard_map over 'data' axis + psum), and
  2. the sharded Schur-complement bundle-adjustment step (landmark shards,
     psum'd reduced camera system) — the engine's "training step" analogue.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from visualslam_tpu.frontend import detect_and_describe
from visualslam_tpu.parallel.mesh import make_mesh
from visualslam_tpu.utils.config import DEFAULT_CONFIG, BAConfig


def _dryrun_frontend(n_devices: int) -> None:
    mesh = make_mesh(n_devices, axis="data")
    cfg = DEFAULT_CONFIG.replace(image_height=64, image_width=96)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((n_devices, 64, 96), dtype=np.float32))

    def step(batch):
        feats = jax.vmap(lambda im: detect_and_describe(im, cfg))(batch)
        total = jax.lax.psum(
            jnp.sum(feats.keypoints.valid.astype(jnp.int32)), "data")
        return feats.descriptors, total

    smapped = jax.shard_map(step, mesh=mesh, in_specs=P("data"),
                            out_specs=(P("data"), P()))
    desc, total = jax.jit(smapped)(imgs)
    jax.block_until_ready((desc, total))
    assert desc.shape[0] == n_devices
    print(f"[dryrun] frontend mesh={dict(mesh.shape)} "
          f"total_detections={int(total)}")


def _dryrun_ba(n_devices: int) -> None:
    from visualslam_tpu.backend.ba import BAProblem
    from visualslam_tpu.geometry import se3
    from visualslam_tpu.parallel.dist_ba import run_ba_sharded, shard_problem

    rng = np.random.default_rng(1)
    C, L = 4, 16 * n_devices
    X = rng.uniform([-2, -2, 5], [2, 2, 9], (L, 3))
    R = np.stack([np.asarray(se3.exp_so3(jnp.asarray(
        [0.0, 0.02 * c, 0.0]))) for c in range(C)])
    t = np.stack([np.array([-0.3 * c, 0.0, 0.0]) for c in range(C)])
    cam_idx = np.tile(np.arange(C), L)
    lm_idx = np.repeat(np.arange(L), C)
    Xc = np.einsum("oij,oj->oi", R[cam_idx], X[lm_idx]) + t[cam_idx]
    uv = Xc[:, :2] / Xc[:, 2:]
    p = BAProblem(
        R=jnp.asarray(R, jnp.float32), t=jnp.asarray(t, jnp.float32),
        X=jnp.asarray(X + rng.normal(0, 0.05, X.shape), jnp.float32),
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        lm_idx=jnp.asarray(lm_idx, jnp.int32),
        uv=jnp.asarray(uv, jnp.float32),
        obs_valid=jnp.ones(len(cam_idx), bool),
        cam_valid=jnp.ones(C, bool), lm_valid=jnp.ones(L, bool),
    )
    mesh = make_mesh(n_devices, axis="shard")
    res = run_ba_sharded(shard_problem(p, n_devices), BAConfig(iters=3),
                         mesh)
    jax.block_until_ready(res)
    print(f"[dryrun] sharded BA mesh={dict(mesh.shape)} "
          f"cost {float(res.initial_cost):.3e} -> {float(res.cost):.3e}")
    assert float(res.cost) < float(res.initial_cost)


def run_dryrun(n_devices: int) -> None:
    _dryrun_frontend(n_devices)
    _dryrun_ba(n_devices)
