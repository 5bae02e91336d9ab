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
