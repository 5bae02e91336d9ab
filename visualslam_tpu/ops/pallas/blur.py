"""Pallas TPU kernel: fused multi-sigma separable Gaussian blur.

The scale-space blur is the pyramid's dominant cost. XLA's conv lowering is
poor for this shape (C_in=1, tiny channel counts — nothing for the MXU to
chew on, ~43 ms/frame at KITTI size), so this kernel runs the separable
convolution directly on the VPU with explicit VMEM tiling.

Hardware constraint that shapes the design: K-tap accumulations of LANE-
shifted slices (x-axis conv) make Mosaic materialize a shifted copy per tap
(~43 x 1.4 MB = 50+ MB scoped VMEM -> compile-time OOM), while SUBLANE-
shifted slices (y-axis conv) are cheap. So the conv runs as TWO sublane-conv
passes with XLA transposes in between (TPU transposes are fast):

  pass V: grid (S, H/TILE). Each program DMAs an overlapping [SLAB_H, Wp]
          row slab of the pre-padded image from HBM (overlap is why this is
          a manual async copy: BlockSpec blocks cannot overlap by 2R rows)
          and runs the K-tap y-conv for its sigma via a fori_loop of
          dynamically offset sublane slices.
  XLA:    transpose [S, Hp, Wp] -> [S, Wp, Hp]
  pass H: same kernel shape on the transposed stack — the original x axis
          is now sublanes.
  XLA:    transpose back, crop to [S, H, W].

Taps sit in a small [S, K] VMEM array indexed by the sigma grid axis.
Border handling: symmetric pre-pad, identical to ops/blur.blur_stack —
results match the XLA path to float32 tolerance (tests/test_pallas.py).

Replaces the reference's per-level cv::GaussianBlur (GaussPyramid.cpp:
166-185) — SURVEY.md §2.1 lists per-level blur among the hot loops that
must become Pallas kernels.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _vconv_2d_kernel(taps_ref, in_hbm, out_ref, slab, sem, *,
                     K: int, TILE: int, SLAB: int):
    """y-conv of a 2-D image shared across the sigma grid axis.

    The K-tap accumulation is a STATIC unroll of sublane-shifted slices —
    dynamic (`pl.ds(k, ...)` with traced k) sublane offsets crash this
    platform's remote Mosaic compile, static ones are fine."""
    s = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(in_hbm.at[pl.ds(i * TILE, SLAB), :], slab, sem)
    cp.start()
    cp.wait()
    acc = taps_ref[s, 0] * slab[0:TILE, :]
    for k in range(1, K):
        acc += taps_ref[s, k] * slab[k:k + TILE, :]
    out_ref[0] = acc


def _vconv_3d_kernel(taps_ref, in_hbm, out_ref, slab, sem, *,
                     K: int, TILE: int, SLAB: int):
    """y-conv of a per-sigma 3-D stack (pass H operates on the transpose)."""
    s = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        in_hbm.at[s, pl.ds(i * TILE, SLAB), :], slab, sem)
    cp.start()
    cp.wait()
    acc = taps_ref[s, 0] * slab[0:TILE, :]
    for k in range(1, K):
        acc += taps_ref[s, k] * slab[k:k + TILE, :]
    out_ref[0] = acc


def _conv_pass(x, taps, kernel, S, rows_out, lanes, K, TILE):
    """Run one sublane-conv pass. x: [rows_in(+pad), lanes] or
    [S, rows_in(+pad), lanes]; output [S, rows_out_padded, lanes]."""
    Rp = _round_up(rows_out, TILE)
    n = Rp // TILE
    SLAB = _round_up(TILE + K - 1, 8)
    rows_needed = (n - 1) * TILE + SLAB
    pad_rows = rows_needed - x.shape[-2]
    if pad_rows > 0:
        cfg = [(0, 0)] * (x.ndim - 2) + [(0, pad_rows), (0, 0)]
        x = jnp.pad(x, cfg)
    return pl.pallas_call(
        functools.partial(kernel, K=K, TILE=TILE, SLAB=SLAB),
        grid=(S, n),
        in_specs=[
            pl.BlockSpec((S, K), lambda s, i: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # HBM; DMA'd slabs
        ],
        out_specs=pl.BlockSpec((1, TILE, lanes), lambda s, i: (s, i, 0)),
        out_shape=jax.ShapeDtypeStruct((S, Rp, lanes), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((SLAB, lanes), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(taps, x)


@functools.partial(jax.jit, static_argnums=(1, 2))
def pallas_blur_stack(img: jnp.ndarray, sigmas: tuple, truncate: float = 4.0
                      ) -> jnp.ndarray:
    """Blur [H, W] with S sigmas at once -> [S, H, W] (drop-in for
    ops.blur.blur_stack)."""
    from visualslam_tpu.ops.blur import gaussian_taps

    sigmas = tuple(float(s) for s in sigmas)
    S = len(sigmas)
    H, W = img.shape
    radius = max(max(1, int(math.ceil(truncate * s))) for s in sigmas)
    K = 2 * radius + 1
    taps_np = np.zeros((S, K), np.float32)
    for i, s in enumerate(sigmas):
        t = gaussian_taps(s, truncate=truncate)
        r = (len(t) - 1) // 2
        taps_np[i, radius - r: radius + r + 1] = t
    taps = jnp.asarray(taps_np)

    TILE = 128
    # symmetric pre-pad both axes; lane axes rounded up to 128
    Wp = _round_up(W + 2 * radius, 128)
    padded = jnp.pad(img, ((radius, radius), (radius, radius)),
                     mode="symmetric")
    padded = jnp.pad(padded, ((0, 0), (0, Wp - (W + 2 * radius))))

    # pass V: y-conv -> [S, Hp, Wp]
    v = _conv_pass(padded, taps, _vconv_2d_kernel, S, H, Wp, K, TILE)
    v = v[:, :H, :]

    # pass H: x-conv as a sublane conv on the transpose
    Hp_l = _round_up(H, 128)
    vt = jnp.swapaxes(v, 1, 2)                        # [S, Wp, H]
    if Hp_l != H:
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, Hp_l - H)))
    h = _conv_pass(vt, taps, _vconv_3d_kernel, S, W, Hp_l, K, TILE)
    out = jnp.swapaxes(h[:, :W, :], 1, 2)             # [S, H?, W]
    return out[:, :H, :W]
