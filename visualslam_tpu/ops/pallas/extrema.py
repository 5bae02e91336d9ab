"""Pallas TPU kernels: fused 26-neighbor scale-space extrema scan.

Reference hot loop #1 (SURVEY.md §2.1 note): the per-pixel 3x3x3 min/max
scan of `initialKeypointDetection` (Diff_of_Gauss.cpp:264-293). The XLA
version (ops/extrema.py) expresses it as 26 shifted comparisons + abs +
threshold + mask combine over the whole DoG stack; the kernels here fuse
the entire candidate scoring into ONE pass over VMEM row-tiles:

    score[d, y, x] = |dog[d, y, x]|  if strict 26-neighbor extremum at an
                                     interior (level, y, x) AND
                                     |dog| > 0.5 * contrast_threshold
                   = -BIG            otherwise

Two variants:

* `pallas_extrema_score` — materializes the full masked score map (the
  round-2 kernel, kept for its lane coverage and as the honest losing
  A/B arm: it reads the stack via three full block refs, 3x traffic).
* `pallas_extrema_candidates` — the fused scan + candidate-select: each
  row-tile additionally REDUCES its scores to a per-(level, column)
  block winner (max + row argmax) inside VMEM, so the full score map
  never exists in HBM and the downstream top-k runs over an input
  TH-times smaller. Halo rows come from two pre-sliced side arrays
  instead of duplicate full-block reads, so HBM traffic is ~(TH+2)/TH
  of one pass instead of 3x.

Both kernels are natively batched over an optional leading frame axis and
exposed through `jax.custom_batching.custom_vmap`: the production frontend
is `jit(vmap(detect_and_describe))` (slam/tracker.py), and the default
pallas_call batching rule inserts the mapped axis wherever the batch
tracer carries it (mid-shape here), producing illegal TPU block shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BIG = 1e30


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _scored_tile(ext: jnp.ndarray, i, TH: int, H: int, W: int,
                 threshold: float) -> jnp.ndarray:
    """Masked extrema score of one extended row tile.

    ext: [D, TH + 2, Wp] — the tile plus one halo row on each side.
    Returns [D - 2, TH, Wp]: |dog| at strict interior 26-neighbor extrema
    above the pre-filter, -BIG elsewhere (global interior masking uses the
    REAL dims H, W and the tile's global row offset i * TH).
    """
    D = ext.shape[0]
    c = ext[1:-1, 1:TH + 1, :]                     # centers [D-2, TH, Wp]
    gt = jnp.ones_like(c, dtype=jnp.bool_)
    lt = jnp.ones_like(c, dtype=jnp.bool_)
    for dl in (0, 1, 2):
        for dy in (0, 1, 2):
            n_full = ext[dl:dl + D - 2, dy:dy + TH, :]   # [D-2, TH, Wp]
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
    rows = i * TH + jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, c.shape, 2)
    ok &= (rows >= 1) & (rows <= H - 2) & (cols >= 1) & (cols <= W - 2)
    return jnp.where(ok, score, -_BIG)


# ---------------------------------------------------------------------
# score-map kernel (full masked score output)
# ---------------------------------------------------------------------


def _score_kernel(prev_ref, cur_ref, next_ref, out_ref, *, TH: int, H: int,
                  W: int, threshold: float):
    # refs carry a leading singleton frame axis; H, W are the REAL
    # (unpadded) image dims, ref shapes are padded
    i = pl.program_id(1)

    # extended tile [D, TH+2, W]: last row of the previous block, the
    # current block, first row of the next block
    ext = jnp.concatenate(
        [prev_ref[0, :, TH - 1:TH, :], cur_ref[0], next_ref[0, :, 0:1, :]],
        axis=1)
    out = _scored_tile(ext, i, TH, H, W, threshold)

    # interior levels only; first/last DoG level planes output -BIG.
    # Concatenate instead of .at[1:-1].set(...): scatter has no Pallas TPU
    # lowering, a single whole-ref store of a concatenated value does.
    big = jnp.full((1,) + out.shape[1:], -_BIG, out_ref.dtype)
    out_ref[...] = jnp.concatenate([big, out, big], axis=0)[None]


def _score_batched(x: jnp.ndarray, threshold: float, tile_h: int,
                   H: int, W: int) -> jnp.ndarray:
    """x: padded [B, D, Hp, Wp] -> full masked score map [B, D, Hp, Wp]."""
    B, D, Hp, Wp = x.shape
    n = Hp // tile_h

    def imap(shift):
        return lambda b, i: (b, 0, jnp.clip(i + shift, 0, n - 1), 0)

    spec = lambda s: pl.BlockSpec((1, D, tile_h, Wp), imap(s))  # noqa: E731
    return pl.pallas_call(
        functools.partial(_score_kernel, TH=tile_h, H=H, W=W,
                          threshold=threshold),
        out_shape=jax.ShapeDtypeStruct((B, D, Hp, Wp), jnp.float32),
        grid=(B, n),
        in_specs=[spec(-1), spec(0), spec(1)],
        out_specs=pl.BlockSpec((1, D, tile_h, Wp),
                               lambda b, i: (b, 0, i, 0)),
        interpret=_interpret(),
    )(x, x, x)


@functools.lru_cache(maxsize=16)
def _score_fn(threshold: float, tile_h: int, H: int, W: int):
    # H, W are the REAL dims (inputs arrive padded; deriving them from the
    # padded shape would unmask the padded border band)
    @jax.custom_batching.custom_vmap
    def f(dog):
        return _score_batched(dog[None], threshold, tile_h, H, W)[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, dog):  # noqa: ANN001
        # single-level batching only: a second nested vmap (or an unbatched
        # dog arg) would feed a 5-D array into the pallas_call
        assert list(in_batched) == [True], (
            "pallas extrema score supports exactly one mapped axis")
        return _score_batched(dog, threshold, tile_h, H, W), True

    return f


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
    return _score_fn(threshold, tile_h, H, W)(x)[:, :H, :W]


# ---------------------------------------------------------------------
# fused scan + candidate-select kernel
# ---------------------------------------------------------------------


def _fused_kernel(prev_ref, cur_ref, next_ref, smax_ref, srow_ref, *,
                  TH: int, H: int, W: int, threshold: float):
    """Score one tile AND reduce it to per-(level, column) winners.

    prev/next refs are single pre-sliced halo rows, blocked as
    [1, 1, D, Wp] (NOT full duplicate blocks — that 3x read is why the
    non-reduced kernel loses, benchmarks/extrema_kernel.json)."""
    i = pl.program_id(1)
    ext = jnp.concatenate(
        [prev_ref[0, 0][:, None, :], cur_ref[0],
         next_ref[0, 0][:, None, :]], axis=1)         # [D, TH+2, Wp]
    val = _scored_tile(ext, i, TH, H, W, threshold)   # [D-2, TH, Wp]

    vmax = jnp.max(val, axis=1)                       # [D-2, Wp]
    rowi = jax.lax.broadcasted_iota(jnp.int32, val.shape, 1)
    # argmax via equality: ties (and all--BIG columns) resolve to the
    # largest row index; -BIG winners are masked out by the consumer
    vrow = jnp.max(jnp.where(val == vmax[:, None, :], rowi, -1), axis=1)
    smax_ref[...] = vmax[None, None]
    srow_ref[...] = vrow[None, None]


def _winners_batched(x: jnp.ndarray, threshold: float, tile_h: int,
                     H: int, W: int):
    """x: padded [B, D, Hp, Wp] -> per-tile winner planes
    (smax [B, n, D-2, Wp], srow [B, n, D-2, Wp])."""
    B, D, Hp, Wp = x.shape
    n = Hp // tile_h

    # halo rows, pre-sliced: tile i needs global rows i*TH - 1 and
    # (i+1)*TH. Out-of-range entries (tile 0's prev, the last tile's next)
    # get a clamped junk row — harmless, those outputs are interior-masked.
    # Layout [B, n, D, Wp] so the per-tile block (1, 1, D, Wp) spans the
    # full last-two dims (a [D, 1, Wp] block would violate the TPU
    # block-shape rule: second-minor must be a multiple of 8 or whole).
    prev_rows = jnp.concatenate(
        [x[:, :, 0:1], x[:, :, tile_h - 1:Hp - 1:tile_h]],
        axis=2).transpose(0, 2, 1, 3)                         # [B,n,D,Wp]
    next_rows = jnp.concatenate(
        [x[:, :, tile_h::tile_h], x[:, :, Hp - 1:Hp]],
        axis=2).transpose(0, 2, 1, 3)                         # [B,n,D,Wp]

    halo = pl.BlockSpec((1, 1, D, Wp), lambda b, i: (b, i, 0, 0))
    return pl.pallas_call(
        functools.partial(_fused_kernel, TH=tile_h, H=H, W=W,
                          threshold=threshold),
        out_shape=(jax.ShapeDtypeStruct((B, n, D - 2, Wp), jnp.float32),
                   jax.ShapeDtypeStruct((B, n, D - 2, Wp), jnp.int32)),
        grid=(B, n),
        in_specs=[halo,
                  pl.BlockSpec((1, D, tile_h, Wp),
                               lambda b, i: (b, 0, i, 0)),
                  halo],
        out_specs=(pl.BlockSpec((1, 1, D - 2, Wp),
                                lambda b, i: (b, i, 0, 0)),
                   pl.BlockSpec((1, 1, D - 2, Wp),
                                lambda b, i: (b, i, 0, 0))),
        interpret=_interpret(),
    )(prev_rows, x, next_rows)


@functools.lru_cache(maxsize=16)
def _winners_fn(threshold: float, tile_h: int, H: int, W: int):
    # H, W are the REAL dims (inputs arrive padded; deriving them from the
    # padded shape would unmask the padded border band)
    @jax.custom_batching.custom_vmap
    def f(dog):
        smax, srow = _winners_batched(dog[None], threshold, tile_h, H, W)
        return smax[0], srow[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, dog):  # noqa: ANN001
        # single-level batching only (see _score_fn's rule)
        assert list(in_batched) == [True], (
            "pallas extrema winners supports exactly one mapped axis")
        return (_winners_batched(dog, threshold, tile_h, H, W),
                (True, True))

    return f


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def pallas_extrema_candidates(dog: jnp.ndarray, threshold: float,
                              capacity: int, tile_h: int = 16):
    """Fused extrema scan + candidate selection (the detect stage's
    score->top_k round trip through HBM, in one kernel + a small top-k).

    dog: [D, H, W] f32. Returns (lvl[K], y[K], x[K], score[K], sel[K])
    with K = capacity; positions are interior grid coords of the selected
    extrema. Selection semantics match utils.masked.block_top_k_select:
    at most ONE candidate per (tile_h rows x 1 column x 1 level) region
    from the in-kernel reduce, then at most one per lane-block of the
    winner array — the same 1-D-NMS-flavored dedup the XLA path applies,
    just on a 2-D region. True extrema are sparse; collisions are rare.
    """
    from visualslam_tpu.utils.masked import block_top_k_select

    D, H, W = dog.shape
    pad_h = (-H) % tile_h
    pad_w = (-W) % 128
    x = jnp.pad(dog, ((0, 0), (0, pad_h), (0, pad_w)))
    Wp = W + pad_w

    smax, srow = _winners_fn(threshold, tile_h, H, W)(x)

    flat = smax.reshape(-1)                           # [n * (D-2) * Wp]
    idx, sel = block_top_k_select(flat, flat > -_BIG / 10, capacity)
    per_tile = (D - 2) * Wp
    tile = idx // per_tile
    rem = idx % per_tile
    lvl = (rem // Wp + 1).astype(jnp.int32)
    col = (rem % Wp).astype(jnp.int32)
    row = (tile * tile_h).astype(jnp.int32) + srow.reshape(-1)[idx]
    return lvl, row, col, flat[idx], sel
