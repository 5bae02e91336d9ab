"""Resize ops for pyramid construction.

Reference: 2x linear upsample before octave 0 (GaussPyramid.cpp:109-110,
INTER_LINEAR) and 0.5x nearest downsample between octaves
(GaussPyramid.cpp:123-126, INTER_NEAREST).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample2x_linear(img: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample of [..., H, W] (half-pixel centers)."""
    out_shape = img.shape[:-2] + (img.shape[-2] * 2, img.shape[-1] * 2)
    return jax.image.resize(img, out_shape, method="linear")


def downsample2x_nearest(img: jnp.ndarray) -> jnp.ndarray:
    """0.5x nearest downsample: every second pixel (INTER_NEAREST picks the
    source pixel nearest each half-pixel destination center, i.e. stride-2)."""
    return img[..., ::2, ::2]
