"""Pallas kernel tests (interpret mode on CPU) vs the XLA reference ops."""

import numpy as np

import jax.numpy as jnp

from visualslam_tpu.ops.blur import blur_stack
from visualslam_tpu.ops.pallas.blur import pallas_blur_stack

SIGMAS = (1.6, 2.0158737, 2.5398417, 3.2, 4.0317473, 5.0796833)


def test_pallas_blur_matches_xla(rng):
    img = rng.random((96, 200), dtype=np.float32)
    got = np.asarray(pallas_blur_stack(jnp.asarray(img), SIGMAS))
    want = np.asarray(blur_stack(jnp.asarray(img), SIGMAS))
    assert got.shape == want.shape == (6, 96, 200)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pallas_blur_odd_sizes(rng):
    """Non-128-multiple W and non-tile-multiple H exercise edge masking."""
    img = rng.random((83, 131), dtype=np.float32)
    got = np.asarray(pallas_blur_stack(jnp.asarray(img), (1.6, 3.2)))
    want = np.asarray(blur_stack(jnp.asarray(img), (1.6, 3.2)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pyramid_pallas_mode_matches_absolute(rng):
    from visualslam_tpu.models.pyramid import build_pyramid
    from visualslam_tpu.utils.config import PyramidConfig

    img = jnp.asarray(rng.random((64, 72), dtype=np.float32))
    ss_p = build_pyramid(img, PyramidConfig(num_octaves=2,
                                            blur_mode="pallas"))
    ss_a = build_pyramid(img, PyramidConfig(num_octaves=2,
                                            blur_mode="conv"))
    for o in range(2):
        np.testing.assert_allclose(np.asarray(ss_p.gauss[o]),
                                   np.asarray(ss_a.gauss[o]), atol=3e-5)
        np.testing.assert_allclose(np.asarray(ss_p.dog[o]),
                                   np.asarray(ss_a.dog[o]), atol=6e-5)


def test_pallas_extrema_matches_xla(rng):
    """Fused extrema-score kernel == XLA mask+score path (interpret mode)."""
    import jax.numpy as jnp

    from visualslam_tpu.ops.extrema import extrema_mask
    from visualslam_tpu.ops.pallas.extrema import pallas_extrema_score

    dog = rng.standard_normal((5, 37, 150)).astype(np.float32) * 0.1
    thr = 0.03
    score = pallas_extrema_score(jnp.asarray(dog), thr)

    mask = np.asarray(extrema_mask(jnp.asarray(dog)))
    want_ok = mask & (np.abs(dog) > 0.5 * thr)
    got_ok = np.asarray(score) > -1e29
    np.testing.assert_array_equal(got_ok, want_ok)
    np.testing.assert_allclose(np.asarray(score)[got_ok],
                               np.abs(dog)[want_ok], rtol=1e-6)


def test_pallas_extrema_candidates_finds_true_extrema(rng):
    """The fused scan+select kernel recovers every true extremum (interpret
    mode). Sparse spikes -> no block collisions, so the candidate SET must
    match the XLA mask path exactly, positions included."""
    from visualslam_tpu.ops.extrema import extrema_mask
    from visualslam_tpu.ops.pallas.extrema import pallas_extrema_candidates

    thr = 0.03
    # smooth low-amplitude background (below the pre-filter) + isolated
    # spikes well inside the interior
    dog = (rng.standard_normal((5, 53, 170)).astype(np.float32) * 1e-3)
    spikes = [(1, 5, 9, 0.5), (2, 17, 40, -0.8), (3, 30, 120, 0.6),
              (1, 44, 165, 0.4), (2, 50, 20, -0.35)]
    for lv, y, x, v in spikes:
        dog[lv, y, x] = v

    lvl, yy, xx, score, sel = pallas_extrema_candidates(
        jnp.asarray(dog), thr, 16)
    got = {(int(l), int(a), int(b))
           for l, a, b, s in zip(np.asarray(lvl), np.asarray(yy),
                                 np.asarray(xx), np.asarray(sel)) if s}

    mask = np.asarray(extrema_mask(jnp.asarray(dog))).copy()
    mask &= np.abs(dog) > 0.5 * thr
    want = {tuple(int(v) for v in p) for p in np.argwhere(mask)}
    # every spike is a true extremum of its 26-neighborhood
    assert {(lv, y, x) for lv, y, x, _ in spikes} <= want
    assert got == want
    for l, a, b, s, sc in zip(np.asarray(lvl), np.asarray(yy),
                              np.asarray(xx), np.asarray(sel),
                              np.asarray(score)):
        if s:
            np.testing.assert_allclose(sc, abs(dog[l, a, b]), rtol=1e-6)


def test_pallas_extrema_candidates_dense(rng):
    """Dense random DoG: every selected candidate must be a genuine masked
    extremum with the right score (collisions may DROP candidates vs the
    exact top-k — same contract as utils.masked.block_top_k_select — but
    must never fabricate or misplace one)."""
    from visualslam_tpu.ops.extrema import extrema_mask
    from visualslam_tpu.ops.pallas.extrema import pallas_extrema_candidates

    thr = 0.03
    dog = rng.standard_normal((5, 61, 190)).astype(np.float32) * 0.1
    lvl, yy, xx, score, sel = pallas_extrema_candidates(
        jnp.asarray(dog), thr, 64)
    mask = np.asarray(extrema_mask(jnp.asarray(dog))).copy()
    mask &= np.abs(dog) > 0.5 * thr
    n_sel = int(np.asarray(sel).sum())
    assert n_sel > 0
    for l, a, b, s, sc in zip(np.asarray(lvl), np.asarray(yy),
                              np.asarray(xx), np.asarray(sel),
                              np.asarray(score)):
        if s:
            assert mask[l, a, b]
            np.testing.assert_allclose(sc, abs(dog[l, a, b]), rtol=1e-6)
