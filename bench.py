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


def _bench(fn, *args, warmup: int = 2, iters: int = 10) -> float:
    """Median wall-clock seconds per call (block_until_ready semantics)."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
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
    img = jnp.asarray(rng.random((h, w), dtype=np.float32))

    fn = jax.jit(lambda im: detect_and_describe(im, cfg))
    sec = _bench(fn, img)
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
