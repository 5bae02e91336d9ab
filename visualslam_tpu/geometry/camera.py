"""Pinhole camera model.

Intrinsics are a [4] array [fx, fy, cx, cy] (KITTI grayscale cameras are
pure pinhole after rectification — no distortion model needed for the
odometry benchmark; a distortion hook can wrap project/unproject later).
"""

from __future__ import annotations

import jax.numpy as jnp


def project(X: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points [..., 3] -> pixel coords [..., 2] (x, y)."""
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    z = X[..., 2]
    u = fx * X[..., 0] / z + cx
    v = fy * X[..., 1] / z + cy
    return jnp.stack([u, v], -1)


def unproject(uv: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords [..., 2] (x, y) -> normalized camera rays [..., 3]
    with z = 1."""
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    return jnp.stack([x, y, jnp.ones_like(x)], -1)


def normalized(uv: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords -> normalized image plane coords [..., 2]."""
    return unproject(uv, intr)[..., :2]
