"""Per-stage breakdown of the end-to-end SLAM loop + frontend MFU estimate.

Answers VERDICT r2 item 1: where do the ms/frame go between the frontend,
per-frame tracking dispatch, the stats readback, the keyframe path
(kf_step + readback + host map update + window-BA dispatch + loop closure +
device-cache rebuild)?

Methodology (axon relay environment): wall-clock timers around each host
stage of the SAME workload bench.py times. Dispatch stages measure host
dispatch cost (device work is async); the readback stages absorb whatever
device work the host had to wait for. The sum of stage means ~= the
sequence wall time, so the table directly explains the headline fps.
The relay memoizes identical executions, so frames are rendered once and
every timed execution sees distinct inputs.

MFU: the frontend program's FLOP count comes from XLA's own cost analysis
(compiled.cost_analysis()['flops']); device time from the slope between
batch sizes (dispatch overhead cancels). MFU = achieved FLOP/s over the
TPU v5e peak (197 TFLOP/s bf16 / 98304 GFLOP/s f32-equivalent is not
published per-precision; we report against the bf16 peak as the
conservative denominator).

Writes benchmarks/stage_breakdown.json. Usage:
    python -m benchmarks.stage_breakdown
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

PEAK_FLOPS_BF16 = 197e12    # TPU v5e (v5 lite) peak, bf16 MXU
SEQ_FRAMES = 96


def measure_hbm_ceiling(jax, jnp) -> float:
    """Effective HBM bandwidth ceiling (GB/s) from a pure streaming
    transform: y = a*x + b over two sizes, slope method on distinct
    buffers (each element is 1 read + 1 write = 8 bytes at f32). This is
    the denominator every 'fraction of bandwidth' claim below uses — the
    round-3 artifact divided XLA cost-analysis bytes by wall time and
    reported 2754 GB/s on an ~819 GB/s part (VERDICT r3 weak 2)."""
    sizes = (1 << 26, 3 << 26)                  # 256 MB / 768 MB of f32

    def fn(x):
        return jnp.sum(x * 1.0001 + 0.5)

    times = {}
    for n in sizes:
        comp = jax.jit(fn).lower(
            jax.ShapeDtypeStruct((n,), jnp.float32)).compile()
        rng = np.random.default_rng(n)
        xs = [jnp.asarray(rng.random(n, dtype=np.float32))
              for _ in range(3)]
        for x in xs:
            x.block_until_ready()
        float(comp(xs[0]))                      # warm
        ts = []
        for x in xs:
            t0 = time.perf_counter()
            float(comp(x))
            ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    dt = times[sizes[1]] - times[sizes[0]]
    nbytes = (sizes[1] - sizes[0]) * 8          # read + write per element
    return nbytes / max(dt, 1e-12) / 1e9


def _frontend_analytic_bytes(cfg, h, w) -> float:
    """Counted HBM bytes per frame for the frontend's MATERIALIZED major
    arrays (1 write + 1 read each — XLA fuses elementwise chains, so
    counting each logical tensor once is the honest floor; cost-analysis
    'bytes accessed' counts every USE and overstated traffic ~4x in r3).
    Per octave: pyramid levels, DoG, grad mag/ori, the patch crop gather,
    kernel outputs. Detection masks/top-k intermediates ride the DoG."""
    pc, sc = cfg.pyramid, cfg.sift
    scale = 2.0 if pc.initial_upsample else 1.0
    levels = pc.levels_per_octave
    total = 0.0
    for o in range(pc.num_octaves):
        ho = int(h * scale) >> o
        wo = int(w * scale) >> o
        px = ho * wo * 4.0
        gauss = levels * px
        dog = (levels - 1) * px
        grads = 2 * (levels - 2) * px           # interior-level mag + ori
        K = sc.octave_capacity(o)
        crop = K * 2 * 28 * 128 * 4.0           # segment-gather patches
        kern = 2 * K * 128 * 4.0                # hist + descriptor rows
        total += 2 * (gauss + dog + grads) + 2 * crop + 2 * kern
    return total


def frontend_mfu(jax, jnp, cfg) -> dict:
    from visualslam_tpu.frontend import detect_and_describe

    h, w = 376, 1248
    ceiling = measure_hbm_ceiling(jax, jnp)

    def make(b, seed):
        r = np.random.default_rng(seed)
        return jnp.asarray(r.integers(0, 256, (b, h, w), dtype=np.uint8))

    def fn(ims):
        feats = jax.vmap(lambda im: detect_and_describe(im, cfg))(ims)
        return (jnp.sum(feats.descriptors) + jnp.sum(feats.keypoints.yx)
                + jnp.sum(feats.keypoints.response))

    sizes = (8, 24)
    compiled = {}
    for b in sizes:
        compiled[b] = jax.jit(fn).lower(make(b, 0)).compile()
        float(compiled[b](make(b, 1)))
    # slope method: distinct inputs per call (relay memoizes identical
    # executions); dispatch overhead cancels in the difference. The timed
    # region ends on a scalar READBACK — on the relay backend
    # block_until_ready returns at dispatch acknowledgement, not
    # completion, so only a value fetch closes the clock honestly.
    times = {}
    for b in sizes:
        ts = []
        for k in range(4):
            x = make(b, 100 + k)
            x.block_until_ready()
            t0 = time.perf_counter()
            float(compiled[b](x))
            ts.append(time.perf_counter() - t0)
        times[b] = min(ts)
    per_frame_s = (times[sizes[1]] - times[sizes[0]]) / (sizes[1] - sizes[0])
    ca = compiled[sizes[1]].cost_analysis()
    flops = float(ca.get("flops", 0.0)) / sizes[1]
    hbm = _frontend_analytic_bytes(cfg, h, w)
    achieved = flops / max(per_frame_s, 1e-12)
    gbps = hbm / max(per_frame_s, 1e-12) / 1e9
    return {
        "hbm_ceiling_gbps_measured": round(ceiling, 1),
        "frontend_device_ms_per_frame": round(per_frame_s * 1e3, 3),
        "frontend_flops_per_frame": flops,
        "frontend_hbm_bytes_per_frame_analytic": hbm,
        "frontend_achieved_tflops": round(achieved / 1e12, 3),
        "frontend_mfu_vs_bf16_peak": round(achieved / PEAK_FLOPS_BF16, 4),
        "frontend_hbm_gbps_analytic": round(gbps, 1),
        "frontend_hbm_fraction_of_ceiling": round(gbps / ceiling, 3),
        "bytes_method": (
            "analytic per materialized tensor (1 write + 1 read); "
            "ceiling measured with a streaming a*x+b slope benchmark"),
    }


def sequence_breakdown(jax, jnp, cfg) -> dict:
    from visualslam_tpu.io.kitti import SyntheticSequence
    from visualslam_tpu.slam.tracker import Tracker
    from visualslam_tpu.utils.profiling import StageTimer

    seq = SyntheticSequence(num_frames=SEQ_FRAMES + 8, h=376, w=1248,
                            n_dots=8000, step=0.4)
    info = seq.info()
    frames = np.stack([seq.frame(k) for k in range(len(seq))])
    frames = np.clip(frames * 255.0, 0, 255).astype(np.uint8)

    warm_seq = SyntheticSequence(num_frames=24, h=376, w=1248,
                                 n_dots=8000, step=0.4, seed=7)
    wf = np.clip(np.stack([warm_seq.frame(k) for k in range(24)]) * 255.0,
                 0, 255).astype(np.uint8)
    warm = Tracker(cfg, warm_seq.info().intrinsics)
    warm.process_batch(wf[:8], 0)
    warm.process_stream(wf[8:24], 8)
    warm.finish()
    del warm

    tracker = Tracker(cfg, info.intrinsics)
    tracker.process_batch(frames[:8], 0)
    timer = StageTimer()
    tracker.timer = timer
    t0 = time.perf_counter()
    for k in range(8, len(frames), 16):
        tracker.process_stream(frames[k:k + 16], k)
    tracker.finish()
    total = time.perf_counter() - t0
    n = len(frames) - 8

    stages = timer.summary()
    covered = sum(v["total_s"] for v in stages.values())
    out = {
        "seq_frames": n,
        "sequence_fps": round(n / total, 2),
        "wall_ms_per_frame": round(total / n * 1e3, 3),
        "stage_ms_per_frame": {
            k: round(v["total_s"] / n * 1e3, 3) for k, v in stages.items()},
        "stage_detail": stages,
        "uncovered_ms_per_frame": round((total - covered) / n * 1e3, 3),
        "keyframes": int(sum(f.is_keyframe for f in tracker.frames)),
    }
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp

    from visualslam_tpu.utils.config import FAST_CONFIG

    cfg = FAST_CONFIG
    out = {"device": str(jax.devices()[0])}
    out.update(frontend_mfu(jax, jnp, cfg))
    out["roofline_notes"] = (
        f"Frontend: {out['frontend_hbm_bytes_per_frame_analytic'] / 1e6:.0f}"
        f" MB/frame of materialized tensors over "
        f"{out['frontend_device_ms_per_frame']} ms = "
        f"{out['frontend_hbm_gbps_analytic']} GB/s, "
        f"{out['frontend_hbm_fraction_of_ceiling']:.0%} of the measured "
        f"{out['hbm_ceiling_gbps_measured']} GB/s streaming ceiling — the "
        "pyramid/DoG/gradient stages are the bandwidth-bound part (dense "
        "full-image tensors); the detect top-k and per-keypoint "
        "crop/sample/histogram stages are gather- and small-op-bound, not "
        "bandwidth-bound, which is why the frontend sits well below the "
        "ceiling and why the fused Pallas kernels "
        "(benchmarks/patch_kernel.json) buy time that the byte count "
        "alone would not predict. MFU vs the bf16 MXU peak is reported "
        "for completeness but is NOT the binding roofline: the frontend "
        "is not a matmul workload.")
    out.update(sequence_breakdown(jax, jnp, cfg))

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "stage_breakdown.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
