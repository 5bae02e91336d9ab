"""Pallas TPU kernel: tiled all-pairs L2 distance with fused 2-NN reduction.

SURVEY.md §7 names the "tiled all-pairs distance kernel + ratio test
on-chip" as a core kernel. The XLA matcher (ops/distance.py) materializes
the full [Ka, Kb] matrix and runs top-k over it; this kernel never
materializes it: the grid walks B in tiles (innermost axis), each step does
one MXU matmul A_tile @ B_tile^T and folds the tile's per-row minimum and
second-minimum into running 2-NN state held in VMEM scratch (the
flash-attention streaming pattern applied to nearest-neighbor search).

Outputs per A row: best distance, second-best distance, best index — exactly
what the Lowe ratio test consumes. Mutual cross-check = a second call with
(B, A) swapped. Invalid B rows are masked by the caller (descriptor rows set
to a large constant so their distances never win).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _kernel(a_ref, b_ref, best_ref, second_ref, idx_ref,
            best_s, second_s, idx_s, *, TB: int):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_s[0, :] = jnp.full_like(best_s[0, :], _BIG)
        second_s[0, :] = jnp.full_like(second_s[0, :], _BIG)
        idx_s[0, :] = jnp.zeros_like(idx_s[0, :])

    a = a_ref[0]                                           # [TA, D]
    b = b_ref[0]                                           # [TB, D]
    na = jnp.sum(a * a, axis=-1, keepdims=True)            # [TA, 1]
    nb = jnp.sum(b * b, axis=-1, keepdims=True)            # [TB, 1]
    d = na + nb.T - 2.0 * jnp.dot(a, b.T,
                                  preferred_element_type=jnp.float32)
    d = jnp.maximum(d, 0.0)                                # [TA, TB]

    tmin = jnp.min(d, axis=1)                              # [TA]
    targ = jnp.argmin(d, axis=1).astype(jnp.int32)         # [TA]
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d2 = jnp.where(cols == targ[:, None], _BIG, d)
    t2 = jnp.min(d2, axis=1)                               # [TA] tile 2nd-min

    best = best_s[0, :]
    second = second_s[0, :]
    arg = idx_s[0, :]
    new_best = jnp.minimum(best, tmin)
    new_second = jnp.minimum(jnp.minimum(second, t2),
                             jnp.maximum(best, tmin))
    new_arg = jnp.where(tmin < best, targ + j * TB, arg)
    best_s[0, :] = new_best
    second_s[0, :] = new_second
    idx_s[0, :] = new_arg

    @pl.when(j == nj - 1)
    def _():
        # outputs are (8, TILE) blocks (1-row blocks violate Mosaic tiling,
        # 1-D outputs hit XLA-vs-Mosaic layout mismatches) — broadcast-fill
        best_ref[0] = jnp.broadcast_to(new_best, best_ref.shape[1:])
        second_ref[0] = jnp.broadcast_to(new_second, second_ref.shape[1:])
        idx_ref[0] = jnp.broadcast_to(new_arg, idx_ref.shape[1:])


@functools.partial(jax.jit, static_argnums=(2, 3))
def pallas_l2_2nn(a: jnp.ndarray, b: jnp.ndarray,
                  tile_a: int = 256, tile_b: int = 256):
    """Streaming 2-nearest-neighbor search under squared-L2.

    a: [Ka, D], b: [Kb, D] (Ka/Kb multiples of the tiles, D lane-aligned).
    Returns (best [Ka], second [Ka], index [Ka] int32)."""
    Ka, D = a.shape
    Kb = b.shape[0]
    assert Ka % tile_a == 0 and Kb % tile_b == 0, (Ka, Kb, tile_a, tile_b)
    ni = Ka // tile_a
    nj = Kb // tile_b
    best, second, idx = pl.pallas_call(
        functools.partial(_kernel, TB=tile_b),
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((1, tile_a, D), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tile_b, D), lambda i, j: (j, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, tile_a), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 8, tile_a), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 8, tile_a), lambda i, j: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ni, 8, tile_a), jnp.float32),
            jax.ShapeDtypeStruct((ni, 8, tile_a), jnp.float32),
            jax.ShapeDtypeStruct((ni, 8, tile_a), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, tile_a), jnp.float32),
            pltpu.VMEM((8, tile_a), jnp.float32),
            pltpu.VMEM((8, tile_a), jnp.int32),
        ],
        interpret=_interpret(),
    )(a.reshape(ni, tile_a, D).astype(jnp.float32),
      b.reshape(nj, tile_b, D).astype(jnp.float32))
    return (best[:, 0, :].reshape(-1), second[:, 0, :].reshape(-1),
            idx[:, 0, :].reshape(-1))
