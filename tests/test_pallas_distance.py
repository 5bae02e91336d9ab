"""Tests for the streaming 2-NN Pallas distance kernel (interpret mode on
CPU) and its integration into the matcher."""

import numpy as np

import jax.numpy as jnp

from visualslam_tpu.models.matching import match_features
from visualslam_tpu.ops.pallas.distance import pallas_l2_2nn
from visualslam_tpu.utils.config import MatchConfig

from test_matching import make_features


def test_2nn_matches_bruteforce(rng):
    a = rng.standard_normal((512, 128)).astype(np.float32)
    b = rng.standard_normal((512, 128)).astype(np.float32)
    best, second, idx = pallas_l2_2nn(jnp.asarray(a), jnp.asarray(b),
                                      128, 128)
    d = ((a[:, None] - b[None]) ** 2).sum(-1)
    want_idx = d.argmin(1)
    part = np.partition(d, 1, axis=1)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(np.asarray(best), part[:, 0], atol=1e-2)
    np.testing.assert_allclose(np.asarray(second), part[:, 1], atol=1e-2)


def test_2nn_single_tile(rng):
    a = rng.standard_normal((256, 128)).astype(np.float32)
    b = rng.standard_normal((256, 128)).astype(np.float32)
    best, second, idx = pallas_l2_2nn(jnp.asarray(a), jnp.asarray(b))
    d = ((a[:, None] - b[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(1))


def test_matcher_pallas_equals_xla(rng):
    d = rng.standard_normal((256, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    perm = rng.permutation(256)
    valid_b = np.ones(256, bool)
    valid_b[200:] = False
    fa = make_features(d)
    fb = make_features(d[perm], valid_b[perm])

    m_x = match_features(fa, fb, MatchConfig(max_matches=256, ratio=0.9,
                                             impl="xla"))
    m_p = match_features(fa, fb, MatchConfig(max_matches=256, ratio=0.9,
                                             impl="pallas", tile=128))
    np.testing.assert_array_equal(np.asarray(m_x.valid), np.asarray(m_p.valid))
    v = np.asarray(m_x.valid)
    np.testing.assert_array_equal(np.asarray(m_x.idx_a)[v],
                                  np.asarray(m_p.idx_a)[v])
    np.testing.assert_array_equal(np.asarray(m_x.idx_b)[v],
                                  np.asarray(m_p.idx_b)[v])
