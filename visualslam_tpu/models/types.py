"""Shared fixed-capacity feature types (pytrees).

Replaces the reference's dynamic std::vector<SLAM::point>
(Diff_of_Gauss.cpp:27-35: x, y, size, angle, octave, layer, response) with a
struct-of-arrays + validity mask, per SURVEY.md §7 "hard parts".
Coordinates are (y, x) in BASE image pixels (the reference stores per-octave
coords and rescales at the end via recalculateSize, Diff_of_Gauss.cpp:720-724;
we keep both: yx is base-image, yx_oct is octave-level).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class Keypoints(NamedTuple):
    """[K]-shaped SoA of detected keypoints. Invalid slots have valid=False
    and zeroed fields."""

    yx: jnp.ndarray         # [K, 2] float32, base-image pixel coords (y, x)
    yx_oct: jnp.ndarray     # [K, 2] float32, coords within the (octave, level) image
    octave: jnp.ndarray     # [K] int32
    level: jnp.ndarray      # [K] int32 (DoG level for SIFT; pyramid level for ORB)
    sigma: jnp.ndarray      # [K] float32, absolute scale in base-image units
    orientation: jnp.ndarray  # [K] float32 degrees [0, 360)
    response: jnp.ndarray   # [K] float32 detector response (|DoG|, Harris R, ...)
    valid: jnp.ndarray      # [K] bool

    @property
    def capacity(self) -> int:
        return self.yx.shape[0]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))

    @staticmethod
    def empty(k: int) -> "Keypoints":
        f = jnp.zeros((k,), jnp.float32)
        return Keypoints(
            yx=jnp.zeros((k, 2), jnp.float32),
            yx_oct=jnp.zeros((k, 2), jnp.float32),
            octave=jnp.zeros((k,), jnp.int32),
            level=jnp.zeros((k,), jnp.int32),
            sigma=f, orientation=f, response=f,
            valid=jnp.zeros((k,), bool),
        )


class Features(NamedTuple):
    """Keypoints plus their descriptors.

    descriptors: [K, D] float32 (SIFT 128-D) or [K, W] uint32 bit-packed
    (ORB, W = bits/32)."""

    keypoints: Keypoints
    descriptors: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.keypoints.capacity


class Matches(NamedTuple):
    """Fixed-capacity match set between two Feature sets."""

    idx_a: jnp.ndarray      # [M] int32 index into features_a
    idx_b: jnp.ndarray      # [M] int32 index into features_b
    distance: jnp.ndarray   # [M] float32
    valid: jnp.ndarray      # [M] bool

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))
