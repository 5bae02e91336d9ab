"""Image gradients, magnitude, and orientation.

Reference computes per-level Sobel ksize=1 (which is the plain central
difference [-1, 0, 1]), magnitude, and phase in degrees [0, 360)
(GaussPyramid.cpp:65-104 `processGradients`). Implemented here as shifted
slices on an edge-padded image — XLA fuses these into a single elementwise
program, no conv needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def central_diff(img: jnp.ndarray):
    """(dx, dy) central differences of [..., H, W], replicate border.

    Unscaled [-1, 0, 1] taps, matching cv::Sobel ksize=1 (GaussPyramid.cpp:87-90).
    """
    pad_x = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(0, 0), (1, 1)], mode="edge")
    pad_y = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(1, 1), (0, 0)], mode="edge")
    dx = pad_x[..., :, 2:] - pad_x[..., :, :-2]
    dy = pad_y[..., 2:, :] - pad_y[..., :-2, :]
    return dx, dy


def magnitude_orientation(dx: jnp.ndarray, dy: jnp.ndarray):
    """(magnitude, orientation_degrees in [0, 360)) — cv::magnitude/cv::phase
    equivalents (GaussPyramid.cpp:93-97)."""
    mag = jnp.sqrt(dx * dx + dy * dy)
    ori = jnp.degrees(jnp.arctan2(dy, dx))
    ori = jnp.where(ori < 0.0, ori + 360.0, ori)
    return mag, ori


def gradients(img: jnp.ndarray):
    """Full gradient product set: (dx, dy, mag, ori_degrees)."""
    dx, dy = central_diff(img)
    mag, ori = magnitude_orientation(dx, dy)
    return dx, dy, mag, ori
