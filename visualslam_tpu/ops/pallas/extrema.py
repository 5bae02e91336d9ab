"""Pallas TPU kernel: fused 26-neighbor scale-space extrema scan.

Reference hot loop #1 (SURVEY.md §2.1 note): the per-pixel 3x3x3 min/max
scan of `initialKeypointDetection` (Diff_of_Gauss.cpp:264-293). The XLA
version (ops/extrema.py) expresses it as 26 shifted comparisons + abs +
threshold + mask combine over the whole DoG stack; this kernel fuses the
entire candidate scoring into ONE pass over VMEM row-tiles:

    out[d, y, x] = |dog[d, y, x]|   if strict 26-neighbor extremum at an
                                    interior (level, y, x) AND
                                    |dog| > 0.5 * contrast_threshold
                 = -BIG             otherwise

which is exactly the masked score `detect_extrema` feeds to top-k — the
mask, score, and pre-filter never exist as separate HBM arrays.

Row-halo handling without manual DMA: the same `dog` array is passed three
times with block index maps i-1 / i / i+1 (clamped); the kernel stitches
prev-block-last-row and next-block-first-row onto the current tile. Image
borders are excluded by global-row masking (extrema are interior-only), so
the clamped halo at the first/last tile never affects the output.
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


def _kernel(prev_ref, cur_ref, next_ref, out_ref, *, TH: int, H: int,
            W: int, threshold: float):
    # H, W are the REAL (unpadded) image dims; ref shapes are padded
    i = pl.program_id(0)
    D = cur_ref.shape[0]

    # extended tile [D, TH+2, W]: last row of the previous block, the
    # current block, first row of the next block
    ext = jnp.concatenate(
        [prev_ref[:, TH - 1:TH, :], cur_ref[...], next_ref[:, 0:1, :]],
        axis=1)

    c = ext[1:-1, 1:TH + 1, :]                     # centers [D-2, TH, W]
    gt = jnp.ones_like(c, dtype=jnp.bool_)
    lt = jnp.ones_like(c, dtype=jnp.bool_)
    for dl in (0, 1, 2):
        for dy in (0, 1, 2):
            n_full = ext[dl:dl + D - 2, dy:dy + TH, :]   # [D-2, TH, W]
            for dx in (-1, 0, 1):
                if dl == 1 and dy == 1 and dx == 0:
                    continue
                if dx == 0:
                    n = n_full
                elif dx == 1:
                    # neighbor to the right: shift left, pad right edge
                    n = jnp.concatenate(
                        [n_full[:, :, 1:], n_full[:, :, -1:]], axis=2)
                else:
                    n = jnp.concatenate(
                        [n_full[:, :, :1], n_full[:, :, :-1]], axis=2)
                gt &= c > n
                lt &= c < n

    score = jnp.abs(c)
    ok = (gt | lt) & (score > 0.5 * threshold)

    # interior masking: global row in [1, H-2], column in [1, W-2]
    row0 = i * TH
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, c.shape, 2)
    ok &= (rows >= 1) & (rows <= H - 2) & (cols >= 1) & (cols <= W - 2)

    out = jnp.where(ok, score, -_BIG)
    # interior levels only; first/last DoG level planes output -BIG.
    # Concatenate instead of .at[1:-1].set(...): scatter has no Pallas TPU
    # lowering, a single whole-ref store of a concatenated value does.
    big = jnp.full((1,) + out.shape[1:], -_BIG, out_ref.dtype)
    out_ref[...] = jnp.concatenate([big, out, big], axis=0)


@functools.partial(jax.jit, static_argnums=(1, 2))
def pallas_extrema_score(dog: jnp.ndarray, threshold: float,
                         tile_h: int = 8) -> jnp.ndarray:
    """Masked extrema score of a DoG stack [D, H, W] (f32): |dog| at strict
    interior 26-neighbor extrema above the pre-filter, -BIG elsewhere.
    Feed `score > -1e29` as the mask and `score` to top-k selection."""
    D, H, W = dog.shape
    pad_h = (-H) % tile_h
    pad_w = (-W) % 128
    x = jnp.pad(dog, ((0, 0), (0, pad_h), (0, pad_w)))
    Hp, Wp = H + pad_h, W + pad_w
    n = Hp // tile_h

    def imap(shift):
        return lambda i: (0, jnp.clip(i + shift, 0, n - 1), 0)

    spec = lambda s: pl.BlockSpec((D, tile_h, Wp), imap(s))  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_kernel, TH=tile_h, H=H, W=W,
                          threshold=threshold),
        out_shape=jax.ShapeDtypeStruct((D, Hp, Wp), jnp.float32),
        grid=(n,),
        in_specs=[spec(-1), spec(0), spec(1)],
        out_specs=pl.BlockSpec((D, tile_h, Wp), lambda i: (0, i, 0)),
        interpret=_interpret(),
    )(x, x, x)
    return out[:, :H, :W]
