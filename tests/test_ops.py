"""Numeric golden tests for the base ops (SURVEY.md §4: per-kernel unit tests
vs NumPy/SciPy golden references)."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from visualslam_tpu.ops.blur import blur_stack, box_filter, gaussian_blur, gaussian_taps
from visualslam_tpu.ops.gradients import central_diff, magnitude_orientation
from visualslam_tpu.ops.harris import harris_response
from visualslam_tpu.ops.nms import window_peaks
from visualslam_tpu.ops.resize import downsample2x_nearest, upsample2x_linear


def test_gaussian_taps_normalized():
    for s in [0.5, 1.0, 1.6, 3.2, 5.1]:
        t = gaussian_taps(s)
        assert abs(t.sum() - 1.0) < 1e-6
        assert np.all(t[: len(t) // 2] == t[-1: len(t) // 2: -1])  # symmetric


def test_gaussian_blur_matches_scipy(rng):
    img = rng.random((64, 80), dtype=np.float32)
    for sigma in [0.8, 1.6, 3.0]:
        got = np.asarray(gaussian_blur(jnp.asarray(img), sigma))
        want = ndi.gaussian_filter(img, sigma, mode="reflect", truncate=4.0)
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_blur_stack_matches_individual(rng):
    img = rng.random((48, 56), dtype=np.float32)
    sigmas = [1.6, 2.0158, 2.539, 3.2, 4.031, 5.079]
    stack = np.asarray(blur_stack(jnp.asarray(img), sigmas))
    assert stack.shape == (6, 48, 56)
    for i, s in enumerate(sigmas):
        want = ndi.gaussian_filter(img, s, mode="reflect", truncate=4.0)
        np.testing.assert_allclose(stack[i], want, atol=1e-4)


def test_box_filter_is_window_sum(rng):
    img = rng.random((32, 32), dtype=np.float32)
    got = np.asarray(box_filter(jnp.asarray(img), 3))
    want = ndi.uniform_filter(img, 3, mode="nearest") * 9.0
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_central_diff(rng):
    img = rng.random((16, 20), dtype=np.float32)
    dx, dy = central_diff(jnp.asarray(img))
    # interior matches [-1, 0, 1]
    np.testing.assert_allclose(
        np.asarray(dx)[:, 1:-1], img[:, 2:] - img[:, :-2], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dy)[1:-1, :], img[2:, :] - img[:-2, :], atol=1e-6)
    # replicate border => first column dx = img[:,1] - img[:,0]
    np.testing.assert_allclose(np.asarray(dx)[:, 0], img[:, 1] - img[:, 0], atol=1e-6)


def test_magnitude_orientation_range(rng):
    dx = rng.standard_normal((8, 8)).astype(np.float32)
    dy = rng.standard_normal((8, 8)).astype(np.float32)
    mag, ori = magnitude_orientation(jnp.asarray(dx), jnp.asarray(dy))
    np.testing.assert_allclose(np.asarray(mag), np.hypot(dx, dy), rtol=1e-5)
    o = np.asarray(ori)
    assert (o >= 0).all() and (o < 360.0).all()
    want = np.degrees(np.arctan2(dy, dx)) % 360.0
    np.testing.assert_allclose(o, want, atol=1e-3)


def test_harris_response_golden_vs_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.random((40, 40)).astype(np.float32)
    dx = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=1)
    dy = cv2.Sobel(img, cv2.CV_32F, 0, 1, ksize=1)
    got = np.asarray(harris_response(jnp.asarray(dx), jnp.asarray(dy), 3, 0.04))
    # cv2 scales gradients by 1/((1 << (ksize-1)) * blockSize) = 1/3 here; the
    # response is 4th order in the gradients, so cv2's output is ours / 3^4.
    want = cv2.cornerHarris(img, blockSize=3, ksize=1, k=0.04) * 81.0
    # Compare on the interior (border handling differs).
    np.testing.assert_allclose(got[2:-2, 2:-2], want[2:-2, 2:-2],
                               rtol=1e-3, atol=1e-5)


def test_window_peaks_simple():
    x = np.zeros((9, 9), np.float32)
    x[4, 4] = 2.0
    x[2, 2] = 1.0  # suppressed by the 5x5 neighborhood of (4,4)? distance 2 -> inside
    peaks = np.asarray(window_peaks(jnp.asarray(x), 5, 0.0))
    assert peaks[4, 4]
    assert not peaks[2, 2]
    assert peaks.sum() == 1


def test_resize_roundtrip(rng):
    img = rng.random((16, 24)).astype(np.float32)
    up = upsample2x_linear(jnp.asarray(img))
    assert up.shape == (32, 48)
    down = downsample2x_nearest(up)
    assert down.shape == (16, 24)
    nearest = np.asarray(downsample2x_nearest(jnp.asarray(img)))
    np.testing.assert_allclose(nearest, img[::2, ::2])


def test_rotate_points_quarter_turn():
    from visualslam_tpu.ops.patches import rotate_points

    pts = jnp.asarray([[0.0, 10.0], [0.0, -10.0]])  # (y, x) about origin
    out = np.asarray(rotate_points(pts, 90.0, (0.0, 0.0)))
    # CCW 90deg in image coords: (y, x)=(0, 10) -> (10, 0)
    np.testing.assert_allclose(out[0], [10.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(out[1], [-10.0, 0.0], atol=1e-5)
    # CW inverts
    back = np.asarray(rotate_points(jnp.asarray(out), 90.0, (0.0, 0.0),
                                    clockwise=True))
    np.testing.assert_allclose(back, np.asarray(pts), atol=1e-5)


def test_pyramid_montage(tmp_path, rng):
    import os

    from visualslam_tpu.models.pyramid import build_pyramid
    from visualslam_tpu.slam.viz import save_pyramid_montage
    from visualslam_tpu.utils.config import PyramidConfig

    img = jnp.asarray(rng.random((64, 64), dtype=np.float32))
    ss = build_pyramid(img, PyramidConfig(num_octaves=2))
    p = str(tmp_path / "pyr.png")
    save_pyramid_montage(ss, p)
    assert os.path.getsize(p) > 500


def test_rotate_image_quarter_turns(rng):
    from visualslam_tpu.ops.patches import rotate_image

    img = rng.random((32, 32)).astype(np.float32)
    r90 = np.asarray(rotate_image(jnp.asarray(img), 90.0))
    # CCW 90 deg in image coords (y down) == np.rot90(img, -1)? verify via
    # double application: 180 deg == flip both axes (interior)
    r180 = np.asarray(rotate_image(jnp.asarray(img), 180.0))
    np.testing.assert_allclose(r180[1:-1, 1:-1], img[::-1, ::-1][1:-1, 1:-1],
                               atol=1e-4)
    # rotating back restores (interior; border clamped)
    back = np.asarray(rotate_image(jnp.asarray(r90), -90.0))
    np.testing.assert_allclose(back[4:-4, 4:-4], img[4:-4, 4:-4], atol=1e-4)


def test_sample_bilinear_patches_matches_scattered(rng):
    """The patch-crop + tent-matmul sampler (TPU-fast path) must agree
    exactly with the scattered 4-corner bilinear gather for interior
    keypoints (the descriptor path's regime)."""
    from visualslam_tpu.ops.patches import (
        rotated_grid,
        sample_bilinear_patches,
        sample_bilinear_stack,
    )

    L, H, W, K, S = 3, 96, 128, 64, 16
    stack = jnp.asarray(rng.random((L, H, W, 2), dtype=np.float32))
    yx = jnp.asarray(rng.uniform(20, 70, (K, 2)).astype(np.float32))
    ang = jnp.asarray(rng.uniform(0, 360, K).astype(np.float32))
    lvl = jnp.asarray(rng.integers(0, L, K).astype(np.int32))
    coords = rotated_grid(yx, ang, S, 1.0)

    ref = np.asarray(sample_bilinear_stack(stack, lvl, coords))
    out = np.asarray(sample_bilinear_patches(stack, lvl, yx, coords,
                                             patch=28))
    np.testing.assert_allclose(out, ref, atol=2e-6)

    # channel-less variant
    ref1 = np.asarray(sample_bilinear_stack(stack[..., 0], lvl, coords))
    out1 = np.asarray(sample_bilinear_patches(stack[..., 0], lvl, yx,
                                              coords, patch=28))
    np.testing.assert_allclose(out1, ref1, atol=2e-6)


def test_sample_bilinear_patches_level_smaller_than_patch(rng):
    """Levels smaller than the requested patch (tiny top octaves / dryrun
    images) must still compile: the crop shrinks to the level per axis and
    in-level samples stay exact bilinear (regression: the 64x96 multichip
    dryrun failed with a gather-slice-size error at patch=28 > W=16)."""
    from visualslam_tpu.ops.patches import (
        rotated_grid,
        sample_bilinear_patches,
        sample_bilinear_stack,
    )

    L, H, W, K, S = 2, 12, 16, 8, 4
    stack = jnp.asarray(rng.random((L, H, W), dtype=np.float32))
    yx = jnp.asarray(rng.uniform(4, 8, (K, 2)).astype(np.float32))
    ang = jnp.asarray(rng.uniform(0, 360, K).astype(np.float32))
    lvl = jnp.asarray(rng.integers(0, L, K).astype(np.int32))
    coords = rotated_grid(yx, ang, S, 1.0)

    ref = np.asarray(sample_bilinear_stack(stack, lvl, coords))
    out = np.asarray(sample_bilinear_patches(stack, lvl, yx, coords,
                                             patch=28))
    np.testing.assert_allclose(out, ref, atol=2e-6)
