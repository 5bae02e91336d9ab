"""Benchmark entry point — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: end-to-end frontend frames/s/chip on a KITTI-sized
(376x1241) grayscale frame — detect + describe with the flagship SIFT
frontend. Baseline: BASELINE.json north_star >= 30 frames/s/chip, so
vs_baseline = value / 30.

Runs on whatever jax.devices() provides (real TPU under the driver).
Extra per-stage numbers go to stderr; the single JSON line goes to stdout.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_FPS = 30.0


def _bench(fn, args_list, warmup: int = 2, iters: int = 12) -> float:
    """Median wall-clock seconds per call.

    args_list is a list of DISTINCT arg-tuples cycled across iterations: the
    axon TPU backend memoizes executions whose input buffers are identical,
    so repeated same-buffer calls would measure the cache, not the chip."""
    import jax

    n = len(args_list)
    for i in range(warmup):
        float(fn(*args_list[i % n]))
    times = []
    for i in range(iters):
        a = args_list[(i + warmup) % n]
        t0 = time.perf_counter()
        # float() forces a scalar host readback: on the axon remote backend
        # block_until_ready returns before execution finishes, so only a
        # data-dependent transfer gives honest wall-clock.
        float(fn(*a))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from visualslam_tpu.frontend import detect_and_describe
    from visualslam_tpu.utils.config import DEFAULT_CONFIG

    cfg = DEFAULT_CONFIG
    h, w = 376, 1248  # KITTI-sized, padded to a multiple of 16 for tiling
    rng = np.random.default_rng(0)
    imgs = [(jnp.asarray(rng.random((h, w), dtype=np.float32)),)
            for _ in range(6)]

    @jax.jit
    def fn(im):
        feats = detect_and_describe(im, cfg)
        # scalar checksum depending on every output -> forced full execution
        return (jnp.sum(feats.descriptors) + jnp.sum(feats.keypoints.yx)
                + jnp.sum(feats.keypoints.response))

    sec = _bench(fn, imgs)
    fps = 1.0 / sec

    print(f"[bench] device={jax.devices()[0]} frontend={cfg.frontend} "
          f"image={h}x{w} sec/frame={sec:.4f}", file=sys.stderr)
    print(json.dumps({
        "metric": "frontend_frames_per_s_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
