"""Pallas TPU kernels: fused per-keypoint sampling + histogram stages.

The frontend's two dominant stages after the segment-gather crop are the
orientation histogram and the SIFT descriptor (the reference hot loops at
Diff_of_Gauss.cpp:112-133 and :561-693 + rotation.cpp:100-130). The XLA
formulation (ops/patches.tent_sample_patches + ops/histograms.soft_histogram)
is traffic-bound, not FLOP-bound: the tent interpolation materializes a
[K, C, 256, 128] intermediate (~470 MB/frame at bench shapes) plus the
[K, 256, 128] tent-weight tensors in HBM — measured 3.9 + 2.5 ms/frame of
the ~10.4 ms frontend.

These kernels fuse sample + weight + histogram per keypoint block so the
only HBM traffic is the patches in (28 KB/keypoint) and a [K, 128] row out:

  orientation   integer 16x16 window (tent rows reduce to exact one-hots)
                -> per-keypoint Gaussian weight -> 36-bin circular soft
                histogram
  descriptor    rotated 16x16 grid -> bilinear tent sampling (MXU matmul
                [256, 28] x [28, 128] per channel) -> spatial Gaussian x
                magnitude weights -> 4x4 regions x 8 circular bins packed
                as one 128-wide slot axis

Both consume the channel-first patches of ops/patches.crop_patches
([K, 2, 28, 128]: mag, ori) with their window origins, and keep the XLA
path's semantics bit-approximately (angles interpolate linearly across the
0/360 wrap exactly like the XLA bilinear path — documented parity quirk).
Peak finding, orientation spawning, and descriptor normalization stay in
XLA (cheap [K, B]-shaped ops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TK = 16         # keypoints per program (one f32 sublane tile of outputs)
S = 16          # window side; S*S = 256 samples = 2 lane rows
NSAMP = S * S


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _tent_weights_b(pos: jnp.ndarray, taps: int):
    """[TK, N] float positions -> [TK, N, taps] tent rows (the two
    bilinear weights of each sample; integer positions reduce to exact
    one-hots). Int iota: Mosaic rejects f32 iota."""
    t = jax.lax.broadcasted_iota(
        jnp.int32, pos.shape + (taps,), 2).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - t))


_BATCH_DOT = (((2,), (1,)), ((0,), (0,)))


def _sample_patch_b(mag, ori, py, px):
    """Bilinear-sample both channels for a whole keypoint block.
    mag/ori: [TK, 28, 128]; py/px: [TK, N]. Returns ([TK, N], [TK, N]).
    Batched dot_general keeps the MXU busy across the block instead of
    serializing one tiny matmul per keypoint (the fori variant measured
    ~1.5 us/keypoint; batching is the difference between the kernel
    merely matching XLA and beating it).

    Precision: f32 patches sample at HIGHEST (default f32 matmuls take
    bf16 MXU passes; the ori channel is ANGLES — uncontrolled bf16
    rounding there shifts histogram bins, measured >1e-3 vs XLA on chip).
    bf16 patches (the FAST profile's hist_compute="bf16" opt-in,
    models/sift.py) sample with bf16 tent weights at HIGHEST — an exact
    single bf16 x bf16 -> f32 pass, ~6x fewer MXU passes than f32
    HIGHEST."""
    ph, pw = mag.shape[1:]
    wy = _tent_weights_b(jnp.clip(py, 0.0, ph - 1.0), ph)     # [TK, N, 28]
    wx = _tent_weights_b(jnp.clip(px, 0.0, pw - 1.0), pw)     # [TK, N, 128]
    wy = wy.astype(mag.dtype)
    # Mosaic rejects fp32 contract precision on bf16 operands; DEFAULT is
    # already the exact single bf16 x bf16 -> f32 MXU pass there
    prec = (jax.lax.Precision.HIGHEST if mag.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    tm = jax.lax.dot_general(wy, mag, _BATCH_DOT,
                             preferred_element_type=jnp.float32,
                             precision=prec)
    to = jax.lax.dot_general(wy, ori, _BATCH_DOT,
                             preferred_element_type=jnp.float32,
                             precision=prec)
    return jnp.sum(tm * wx, axis=2), jnp.sum(to * wx, axis=2)


def _circular_tri(pos: jnp.ndarray, bin_of_slot: jnp.ndarray,
                  nbins: int, valid_slot: jnp.ndarray):
    """Soft circular binning: pos [..., N]; bin_of_slot [..., N, 128]
    mapping each output slot to its bin id. Returns [..., N, 128] tent
    contributions (ops/histograms.soft_histogram semantics: centers at
    b + 0.5, linear split between the two nearest bins, circular wrap)."""
    d = pos[..., None] - (bin_of_slot.astype(jnp.float32) + 0.5)
    d = jnp.mod(d + nbins / 2.0, float(nbins)) - nbins / 2.0
    return jnp.where(valid_slot, jnp.maximum(0.0, 1.0 - jnp.abs(d)), 0.0)


def _orient_kernel(par_ref, mag_ref, ori_ref, out_ref, *, nbins: int):
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, NSAMP), 1)[0]
    gy = (idx // S - S // 2).astype(jnp.float32)              # [256] static
    gx = (idx % S - S // 2).astype(jnp.float32)
    # gaussian_window centers on (S-1)/2 while the integer window offsets
    # run -S/2..S/2-1 — the +0.5 keeps exact parity with the XLA path
    r2 = (gy + 0.5) ** 2 + (gx + 0.5) ** 2
    slot = jax.lax.broadcasted_iota(jnp.int32, (TK, NSAMP, 128), 2)
    valid_slot = slot < nbins

    py = par_ref[:, 0:1] + gy[None] - par_ref[:, 2:3]         # [TK, 256]
    px = par_ref[:, 1:2] + gx[None] - par_ref[:, 3:4]
    mag, ang = _sample_patch_b(mag_ref[:, 0], ori_ref[:, 0], py, px)
    sig = jnp.maximum(par_ref[:, 4:5], 1e-6)                  # [TK, 1]
    w = mag * jnp.exp(-r2[None] / (2.0 * sig * sig))          # [TK, 256]
    tri = _circular_tri(ang * (nbins / 360.0), slot, nbins, valid_slot)
    out_ref[:, :] = jnp.sum(tri * w[..., None], axis=1)       # [TK, 128]


def _desc_kernel(par_ref, mag_ref, ori_ref, out_ref, *,
                 width: int, nbins: int):
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, NSAMP), 1)[0]
    row = idx // S
    col = idx % S
    gy = row.astype(jnp.float32) - (S - 1) / 2.0              # [256] static
    gx = col.astype(jnp.float32) - (S - 1) / 2.0
    # static spatial structure: Gaussian (sigma = win/2) over the
    # UNROTATED grid + region id per sample (width x width cells)
    w_spatial = jnp.exp(-(gy * gy + gx * gx) / (2.0 * (S / 2.0) ** 2))
    cell = S // width
    region = (row // cell) * width + col // cell              # [256]
    slot = jax.lax.broadcasted_iota(jnp.int32, (TK, NSAMP, 128), 2)
    D = width * width * nbins
    valid_slot = (slot < D) & (slot // nbins == region[None, :, None])
    bin_of_slot = jnp.mod(slot, nbins)

    a = par_ref[:, 4:5]                                       # [TK, 1]
    th = a * (jnp.pi / 180.0)
    c = jnp.cos(th)
    s = jnp.sin(th)
    ry = s * gx[None] + c * gy[None]                          # [TK, 256]
    rx = c * gx[None] - s * gy[None]
    py = par_ref[:, 0:1] + ry - par_ref[:, 2:3]
    px = par_ref[:, 1:2] + rx - par_ref[:, 3:4]
    mag, ang_s = _sample_patch_b(mag_ref[:, 0], ori_ref[:, 0], py, px)
    rel = jnp.mod(ang_s - a, 360.0)                           # [TK, 256]
    w = mag * w_spatial[None]
    tri = _circular_tri(rel * (nbins / 360.0), bin_of_slot, nbins,
                        valid_slot)
    out_ref[:, :] = jnp.sum(tri * w[..., None], axis=1)       # [TK, 128]


def _pack_params(yx, y0, x0, extra, K_pad):
    """Per-keypoint scalars as ONE lane-aligned VMEM row per keypoint:
    [cy, cx, y0, x0, extra, 0...] — SMEM full-array specs break under
    vmap (the frontend is vmapped over the frame batch), a [K, 128] f32
    params array tiles cleanly everywhere."""
    par = jnp.stack([
        jnp.asarray(yx[:, 0], jnp.float32),
        jnp.asarray(yx[:, 1], jnp.float32),
        y0.astype(jnp.float32), x0.astype(jnp.float32),
        extra.astype(jnp.float32),
    ], axis=-1)
    par = jnp.pad(par, ((0, 0), (0, 128 - par.shape[1])))
    return _pad_k(par, K_pad)


def _pad_k(x, K_pad):
    pad = K_pad - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


@functools.partial(jax.jit, static_argnums=(5,))
def pallas_orient_hist(patches, y0, x0, yx, sigma, nbins: int = 36):
    """Fused orientation-histogram stage. patches: [K, 2, 28, 128]
    channel-first (mag, ori) from crop_patches with origins (y0, x0);
    yx: [K, 2] integer window centers; sigma: [K] Gaussian sigma.
    Returns hist [K, nbins] float32."""
    K = patches.shape[0]
    K_pad = -(-K // TK) * TK
    patches = _pad_k(patches, K_pad)
    grid = (K_pad // TK,)
    par = _pack_params(yx, y0, x0, jnp.asarray(sigma, jnp.float32), K_pad)
    out = pl.pallas_call(
        functools.partial(_orient_kernel, nbins=nbins),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TK, 128), lambda i: (i, 0)),        # params
            # block width = the ACTUAL patch width: narrow top octaves
            # fall back to full-row patches (e.g. 94 < 128); a hardcoded
            # 128 block over-reads into uninitialized VMEM whose garbage
            # NaNs survive 0-weight tent lanes (0 * NaN = NaN)
            pl.BlockSpec((TK, 1, patches.shape[2], patches.shape[3]),
                         lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((TK, 1, patches.shape[2], patches.shape[3]),
                         lambda i: (i, 1, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TK, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((K_pad, 128), jnp.float32),
        interpret=_interpret(),
    )(par, patches, patches)
    return out[:K, :nbins]


@functools.partial(jax.jit, static_argnums=(5, 6))
def pallas_descriptor(patches, y0, x0, yx, angle,
                      width: int = 4, nbins: int = 8):
    """Fused rotated-sampling descriptor stage. patches: [K, 2, 28, 128]
    (mag, ori) with origins; yx: [K, 2] float centers; angle: [K] degrees.
    Returns UNNORMALIZED descriptors [K, width*width*nbins] float32 (the
    region-major layout of models/sift.describe_octave)."""
    K = patches.shape[0]
    K_pad = -(-K // TK) * TK
    patches = _pad_k(patches, K_pad)
    grid = (K_pad // TK,)
    par = _pack_params(yx, y0, x0, jnp.asarray(angle, jnp.float32), K_pad)
    out = pl.pallas_call(
        functools.partial(_desc_kernel, width=width, nbins=nbins),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TK, 128), lambda i: (i, 0)),        # params
            # block width = the ACTUAL patch width: narrow top octaves
            # fall back to full-row patches (e.g. 94 < 128); a hardcoded
            # 128 block over-reads into uninitialized VMEM whose garbage
            # NaNs survive 0-weight tent lanes (0 * NaN = NaN)
            pl.BlockSpec((TK, 1, patches.shape[2], patches.shape[3]),
                         lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((TK, 1, patches.shape[2], patches.shape[3]),
                         lambda i: (i, 1, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TK, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((K_pad, 128), jnp.float32),
        interpret=_interpret(),
    )(par, patches, patches)
    D = width * width * nbins
    return out[:K, :D]
