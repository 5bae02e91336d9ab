"""Distributed BA on the 8-virtual-device CPU mesh: the sharded solver must
match the single-device solver (SURVEY.md §4 implication (4))."""

import numpy as np

import jax
import jax.numpy as jnp

from visualslam_tpu.backend.ba import run_ba_jit
from visualslam_tpu.parallel.dist_ba import (
    run_ba_sharded,
    shard_problem,
    unshard_points,
)
from visualslam_tpu.parallel.mesh import make_mesh
from visualslam_tpu.utils.config import BAConfig

from test_ba import make_ba_problem


def test_sharded_matches_single(rng):
    p, R_gt, t_gt, X_gt = make_ba_problem(rng, n_cams=5, n_lms=320)
    cfg = BAConfig(iters=8)

    single = run_ba_jit(p, cfg)

    mesh = make_mesh(8, axis="shard")
    sp = shard_problem(p, 8)
    dist = run_ba_sharded(sp, cfg, mesh)

    assert float(dist.cost) < float(dist.initial_cost) * 1e-3
    np.testing.assert_allclose(float(dist.initial_cost),
                               float(single.initial_cost), rtol=1e-5)
    # same optimum (fp reduction order differs -> loose-ish tolerances)
    np.testing.assert_allclose(np.asarray(dist.R), np.asarray(single.R),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(dist.t), np.asarray(single.t),
                               atol=5e-3)
    X_d = np.asarray(unshard_points(dist.X))
    np.testing.assert_allclose(X_d, np.asarray(single.X), atol=2e-2)
    # and near ground truth
    for c in range(5):
        Rr = np.asarray(dist.R[c])
        cos = (np.trace(Rr.T @ R_gt[c]) - 1) / 2
        assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.1


def test_shard_problem_roundtrip(rng):
    p, *_ = make_ba_problem(rng, n_cams=4, n_lms=160)
    sp = shard_problem(p, 8)
    assert sp.X.shape == (8, 20, 3)
    # every valid original observation appears exactly once
    total = int(np.asarray(sp.obs_valid).sum())
    assert total == int(np.asarray(p.obs_valid).sum())
    # local lm_idx within range
    li = np.asarray(sp.lm_idx)
    assert li.min() >= 0 and li.max() < 20
