"""Pallas TPU kernel: fused multi-sigma separable Gaussian blur.

The scale-space blur is the pyramid's dominant cost. XLA's conv lowering is
poor for this shape (C_in=1, tiny channel counts — nothing for the MXU to
chew on, ~43 ms/frame at KITTI size), so this kernel runs the separable
convolution directly on the VPU with explicit VMEM tiling.

Single fused kernel, grid (S, H/TILE_H): each program
  1. DMAs an overlapping [TILE_H + 2R, Wp] row slab of the pre-padded image
     from HBM into VMEM (overlap is why this is a manual async copy rather
     than a BlockSpec: blocks would have to overlap by 2R rows);
  2. runs the K-tap vertical conv for its sigma as K shifted-slab FMAs
     (static unroll, VPU);
  3. runs the K-tap horizontal conv as K lane-shifted FMAs;
  4. writes its [TILE_H, Wo] output tile.

No [S, H, W]-sized intermediate ever exists (the two-pallas-call version
OOM'd scoped VMEM when XLA stack-allocated the inter-pass buffer). Taps sit
in a small [S, K] VMEM array indexed by the sigma grid axis. Border
handling: symmetric pre-pad, identical to ops/blur.blur_stack — results
match the XLA path to float32 tolerance (tests/test_pallas.py).

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


def _fused_kernel(taps_ref, in_hbm, out_ref, slab, sem_in, *,
                  K: int, TILE_H: int, SLAB_H: int, Wp: int, Wo: int):
    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        in_hbm.at[pl.ds(i * TILE_H, SLAB_H), :], slab, sem_in)
    copy.start()
    copy.wait()
    # vertical K-tap conv -> [TILE_H, Wp]
    v = taps_ref[0, 0] * slab[0:TILE_H, :]
    for k in range(1, K):
        v += taps_ref[0, k] * slab[k:k + TILE_H, :]
    # horizontal K-tap conv -> [TILE_H, Wo]
    h = taps_ref[0, 0] * v[:, 0:Wo]
    for k in range(1, K):
        h += taps_ref[0, k] * v[:, k:k + Wo]
    out_ref[:] = h


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

    TILE_H = 128
    Wo = _round_up(W, 128)
    Wp = _round_up(Wo + 2 * radius, 128)
    Hp = _round_up(H, TILE_H)
    nh = Hp // TILE_H
    # DMA slab rows must be sublane-aligned (Mosaic: multiples of 8)
    SLAB_H = _round_up(TILE_H + K - 1, 8)

    # symmetric pre-pad; extend so every DMA slab (SLAB_H rows from any tile
    # start) and every lane shift stays in bounds (extra area is zeros,
    # never read back)
    padded = jnp.pad(img, ((radius, radius), (radius, radius)),
                     mode="symmetric")
    rows_needed = max(H + 2 * radius, (nh - 1) * TILE_H + SLAB_H)
    padded = jnp.pad(padded,
                     ((0, rows_needed - (H + 2 * radius)),
                      (0, Wp - (W + 2 * radius))))

    # One pallas_call PER SIGMA: the axon AOT pipeline stack-allocates every
    # pallas result in scoped VMEM (16 MB limit) no matter what memory-space
    # annotation/aliasing we request, so the result must be kept small; a
    # per-sigma [Hp, Wo] tile (<8 MB at KITTI size) fits, the fused
    # [S, Hp, Wo] one does not. The S calls pipeline back-to-back.
    call = pl.pallas_call(
        functools.partial(_fused_kernel, K=K, TILE_H=TILE_H, SLAB_H=SLAB_H,
                          Wp=Wp, Wo=Wo),
        grid=(nh,),
        in_specs=[
            pl.BlockSpec((1, K), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),   # stays in HBM, DMA'd
        ],
        out_specs=pl.BlockSpec((TILE_H, Wo), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Hp, Wo), img.dtype),
        scratch_shapes=[
            pltpu.VMEM((SLAB_H, Wp), img.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )
    levels = [call(taps[s:s + 1], padded) for s in range(S)]
    return jnp.stack(levels)[:, :H, :W]
