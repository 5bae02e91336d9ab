"""Parity tests for the fused orientation/descriptor Pallas kernels
(ops/pallas/descriptor.py) against the XLA reference path
(tent_sample_patches + soft_histogram), on CPU interpret mode. The TPU
lane (tests/test_tpu_lane.py) re-runs the same comparison on the chip."""

import numpy as np
import jax.numpy as jnp
import pytest

from visualslam_tpu.ops.histograms import gaussian_window, soft_histogram
from visualslam_tpu.ops.pallas.descriptor import (
    pallas_descriptor,
    pallas_orient_hist,
)
from visualslam_tpu.ops.patches import (
    crop_patches,
    rotated_grid,
    tent_sample_patches,
)

WIN = 16


def _setup(rng, K=24, L=3, H=96, W=200):
    stack = rng.random((L, H, W, 2), dtype=np.float32)
    stack[..., 1] *= 360.0                       # ori channel in [0, 360)
    y = rng.integers(10, H - 10, K).astype(np.float32)
    x = rng.integers(10, W - 10, K).astype(np.float32)
    lvl = rng.integers(0, L, K).astype(np.int32)
    yx = jnp.asarray(np.stack([y, x], -1))
    patches, y0, x0 = crop_patches(jnp.asarray(stack), jnp.asarray(lvl),
                                   yx, 28)
    return patches, y0, x0, yx


def test_orient_hist_matches_xla(rng):
    patches, y0, x0, yx = _setup(rng)
    K = yx.shape[0]
    sigma = jnp.asarray(1.5 + rng.random(K).astype(np.float32) * 3.0)

    hist_k = pallas_orient_hist(patches, y0, x0, yx, sigma, 36)

    offs = jnp.arange(WIN, dtype=jnp.float32) - WIN // 2
    gy, gx = jnp.meshgrid(offs, offs, indexing="ij")
    grid = jnp.stack([gy, gx], axis=-1)[None]
    both = tent_sample_patches(patches, y0, x0,
                               yx[:, None, None, :] + grid)
    w = gaussian_window(WIN, sigma)
    hist_x = soft_histogram(both[..., 1].reshape(K, -1),
                            (both[..., 0] * w).reshape(K, -1), 36, 360.0)

    np.testing.assert_allclose(np.asarray(hist_k), np.asarray(hist_x),
                               rtol=1e-4, atol=1e-4)


def test_descriptor_matches_xla(rng):
    patches, y0, x0, yx = _setup(rng)
    K = yx.shape[0]
    angle = jnp.asarray(rng.random(K).astype(np.float32) * 360.0)
    # float centers (refined keypoints)
    yxf = yx + jnp.asarray(rng.random((K, 2)).astype(np.float32) - 0.5)

    desc_k = pallas_descriptor(patches, y0, x0, yxf, angle, 4, 8)

    coords = rotated_grid(yxf, angle, WIN, step=1.0)
    both = tent_sample_patches(patches, y0, x0, coords)
    mag = both[..., 0]
    rel = jnp.mod(both[..., 1] - angle[:, None, None], 360.0)
    cell = WIN // 4
    w_spatial = gaussian_window(WIN, WIN / 2.0)

    def to_regions(a):
        a = a.reshape(K, 4, cell, 4, cell)
        return a.transpose(0, 1, 3, 2, 4).reshape(K, 16, cell * cell)

    hist = soft_histogram(to_regions(rel),
                          to_regions(mag * w_spatial[None]), 8, 360.0)
    desc_x = hist.reshape(K, 128)

    np.testing.assert_allclose(np.asarray(desc_k), np.asarray(desc_x),
                               rtol=1e-4, atol=1e-4)


def test_descriptor_rotation_consistency(rng):
    """Same patch content, angles 0 vs 90: a 90-degree-rotated grid over an
    isotropic Gaussian-weighted window keeps total descriptor mass."""
    patches, y0, x0, yx = _setup(rng, K=8)
    d0 = pallas_descriptor(patches, y0, x0, yx, jnp.zeros(8), 4, 8)
    d90 = pallas_descriptor(patches, y0, x0, yx, jnp.full(8, 90.0), 4, 8)
    m0 = np.asarray(jnp.sum(d0, axis=1))
    m90 = np.asarray(jnp.sum(d90, axis=1))
    np.testing.assert_allclose(m0, m90, rtol=0.1)


def test_frontend_pallas_patch_impl_matches(rng):
    """detect_and_describe with patch_impl='pallas' reproduces the XLA
    frontend's keypoints and descriptors."""
    from visualslam_tpu.frontend import detect_and_describe
    from visualslam_tpu.utils.config import DEFAULT_CONFIG

    img = rng.random((120, 160), dtype=np.float32)
    cfg_x = DEFAULT_CONFIG.replace(
        pyramid=DEFAULT_CONFIG.pyramid.replace(num_octaves=2),
        sift=DEFAULT_CONFIG.sift.replace(max_keypoints=256,
                                         max_keypoints_per_octave=128))
    cfg_p = cfg_x.replace(sift=cfg_x.sift.replace(patch_impl="pallas"))
    fx = detect_and_describe(jnp.asarray(img), cfg_x)
    fp = detect_and_describe(jnp.asarray(img), cfg_p)
    nx = int(fx.keypoints.count())
    assert nx > 10
    assert abs(int(fp.keypoints.count()) - nx) <= max(2, 0.05 * nx)
    vx = np.asarray(fx.keypoints.valid)
    vp = np.asarray(fp.keypoints.valid)
    # same keypoint set (up to near-tied orientation-peak boundary swaps)
    a = np.asarray(fx.keypoints.yx)[vx]
    b = np.asarray(fp.keypoints.yx)[vp]
    d = np.linalg.norm(a[:, None] - b[None, :], axis=-1)
    assert (d.min(axis=1) < 0.5).mean() > 0.95
    # descriptors of matched keypoints agree
    j = d.argmin(axis=1)
    close = d.min(axis=1) < 1e-3
    dx = np.asarray(fx.descriptors)[vx][close]
    dp = np.asarray(fp.descriptors)[vp][j[close]]
    cos = (dx * dp).sum(1) / np.maximum(
        np.linalg.norm(dx, axis=1) * np.linalg.norm(dp, axis=1), 1e-9)
    assert np.median(cos) > 0.999
