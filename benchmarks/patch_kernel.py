"""A/B of the fused Pallas orientation/descriptor kernels vs the XLA
formulation (VERDICT r3 item 2: a Pallas kernel that WINS on the default
hot path, with an honest slope-methodology A/B).

Methodology (axon relay environment): cumulative-stage slope timing — the
same full frontend program compiled at batch 8 and 24, timed on distinct
input buffers (the relay memoizes identical executions), per-frame cost =
(t24 - t8) / 16, closed by a scalar readback. Stage cost = difference of
cumulative programs that stop after consecutive stages, so dispatch
overhead and the shared prefix (pyramid, detect, patch crop) cancel.

Writes benchmarks/patch_kernel.json. Usage: python -m benchmarks.patch_kernel
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

H, W = 376, 1248
SIZES = (8, 24)


def _make(jnp, b, seed):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.integers(0, 256, (b, H, W), dtype=np.uint8))


def _time(jax, jnp, fn, seedbase):
    comp = {}
    for b in SIZES:
        comp[b] = jax.jit(fn).lower(_make(jnp, b, 0)).compile()
        float(comp[b](_make(jnp, b, 1)))
    times = {}
    for b in SIZES:
        ts = []
        for k in range(5):
            x = _make(jnp, b, seedbase + k)
            x.block_until_ready()
            t0 = time.perf_counter()
            float(comp[b](x))
            ts.append(time.perf_counter() - t0)
        times[b] = min(ts)
    return (times[SIZES[1]] - times[SIZES[0]]) / (SIZES[1] - SIZES[0]) * 1e3


def _upto(jax, jnp, cfg, stage):
    from visualslam_tpu.models.pyramid import build_pyramid
    from visualslam_tpu.models.sift import _orientation_pass, describe_octave
    from visualslam_tpu.ops.extrema import detect_extrema
    from visualslam_tpu.ops.patches import crop_patches

    pc, sc = cfg.pyramid, cfg.sift

    def one(img):
        img = img.astype(jnp.float32) / 255.0
        ss = build_pyramid(img, pc)
        acc = sum(jnp.sum(d) for d in ss.dog)
        outs = []
        for o in range(pc.num_octaves):
            lvl, y, x, off, resp, valid = detect_extrema(
                ss.dog[o], sc, capacity=sc.octave_capacity(o))
            mag_ori = jnp.stack([ss.grad_mag[o], ss.grad_ori[o]], axis=-1)
            glvl = lvl - ss.grad_level_offset
            yx_int = jnp.stack([y, x], -1).astype(jnp.float32)
            patches, py0, px0 = crop_patches(mag_ori, glvl, yx_int, 28)
            if stage == "crop":
                outs.append(jnp.sum(patches))
                continue
            kps, ci = _orientation_pass(patches, py0, px0, lvl, y, x, off,
                                        resp, valid, pc, sc)
            if stage == "orient":
                outs.append(jnp.sum(kps.orientation) + jnp.sum(kps.response))
                continue
            desc = describe_octave(patches, py0, px0, ci, kps, sc)
            outs.append(jnp.sum(desc) + jnp.sum(kps.response))
        return acc + sum(outs)

    def fn(ims):
        return jnp.sum(jax.vmap(one)(ims))

    return fn


def main() -> None:
    import jax
    import jax.numpy as jnp

    from visualslam_tpu.utils.config import FAST_CONFIG

    out = {"device": str(jax.devices()[0]),
           "image": f"{H}x{W}", "batch_sizes": list(SIZES)}
    seed = 1000
    for impl in ("xla", "pallas"):
        cfg = FAST_CONFIG.replace(
            sift=FAST_CONFIG.sift.replace(patch_impl=impl))
        prev = 0.0
        for stage in ("crop", "orient", "describe"):
            ms = _time(jax, jnp, _upto(jax, jnp, cfg, stage), seed)
            seed += 10
            out[f"{impl}_{stage}_cum_ms_per_frame"] = round(ms, 3)
            if stage != "crop":
                out[f"{impl}_{stage}_ms_per_frame"] = round(ms - prev, 3)
            prev = ms
            print(f"[{impl}] {stage}: {ms:.3f} ms/frame cumulative",
                  file=sys.stderr)
    x = out["xla_orient_ms_per_frame"] + out["xla_describe_ms_per_frame"]
    p = (out["pallas_orient_ms_per_frame"]
         + out["pallas_describe_ms_per_frame"])
    out["xla_stage_pair_ms_per_frame"] = round(x, 3)
    out["pallas_stage_pair_ms_per_frame"] = round(p, 3)
    out["stage_speedup"] = round(x / p, 3)
    out["frontend_speedup"] = round(
        out["xla_describe_cum_ms_per_frame"]
        / out["pallas_describe_cum_ms_per_frame"], 3)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "patch_kernel.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
