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


def test_ring_allreduce_matches_psum(rng):
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from visualslam_tpu.parallel.collectives import ring_allreduce
    from visualslam_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, axis="r")
    x = rng.standard_normal((8, 37)).astype(np.float32)

    def f(v):
        v = v[0]
        return (ring_allreduce(v, "r")[None],
                jax.lax.psum(v, "r")[None])

    ring, ps = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=P("r"), out_specs=(P("r"), P("r"))))(
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ring), np.asarray(ps), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ring)[0], x.sum(0), atol=1e-4)


def test_sharded_ba_ring_reduce(rng):
    p, *_ = make_ba_problem(rng, n_cams=4, n_lms=160)
    cfg = BAConfig(iters=5)
    mesh = make_mesh(8, axis="shard")
    sp = shard_problem(p, 8)
    r_psum = run_ba_sharded(sp, cfg, mesh, reduce="psum")
    r_ring = run_ba_sharded(sp, cfg, mesh, reduce="ring")
    np.testing.assert_allclose(np.asarray(r_ring.R), np.asarray(r_psum.R),
                               atol=1e-4)
    assert float(r_ring.cost) < float(r_ring.initial_cost) * 1e-2
