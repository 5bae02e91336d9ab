"""KITTI-scale end-to-end run on one chip (VERDICT r3 item 8): ~500
KITTI-sized frames through the FULL stack in one process — batched
frontend + device-resident tracking engine + windowed BA + loop closure,
then full-sequence matrix-free global BA — recording throughput, accuracy
and backend rates in ONE artifact. This is the single-chip analogue of
BASELINE configs[4] ("full sequence"), chained end to end instead of
benchmarked as separate pieces.

The trajectory is the loop rectangle (the 500-frame path re-sees its
starting views, so loop closure and the pose graph run for real). Frames
are pre-rendered; only the pipeline is timed. Writes
benchmarks/kitti_scale.json; `cli accuracy` appends the row to
ACCURACY.md when the artifact exists.

Usage: python -m benchmarks.kitti_scale [--frames N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=500)
    args = ap.parse_args(argv)

    import jax

    from visualslam_tpu.io.kitti import SyntheticSequence
    from visualslam_tpu.slam.evaluation import (
        ate_rmse, centers_from_poses, rpe)
    from visualslam_tpu.slam.tracker import Tracker
    from visualslam_tpu.utils.config import FAST_CONFIG

    N = args.frames
    cfg = FAST_CONFIG.replace(
        ba=FAST_CONFIG.ba.replace(solver="schur_mf"))
    seq = SyntheticSequence(num_frames=N, h=376, w=1248, n_dots=12000,
                            step=0.4, trajectory="loop")
    info = seq.info()
    print(f"[kitti_scale] rendering {N} frames...", file=sys.stderr)
    frames = np.stack([seq.frame(k) for k in range(N)])
    frames = np.clip(frames * 255.0, 0, 255).astype(np.uint8)

    # warmup on a different world so the timed run measures execution,
    # not compilation (and the relay cannot memoize identical inputs)
    warm_seq = SyntheticSequence(num_frames=24, h=376, w=1248,
                                 n_dots=12000, step=0.4, seed=7)
    wf = np.clip(np.stack([warm_seq.frame(k) for k in range(24)]) * 255.0,
                 0, 255).astype(np.uint8)
    warm = Tracker(cfg, warm_seq.info().intrinsics)
    warm.process_batch(wf[:8], 0)
    warm.process_batch(wf[8:24], 8)
    del warm

    tracker = Tracker(cfg, info.intrinsics)
    tracker.process_batch(frames[:8], 0)        # bootstrap + two-view init
    t0 = time.perf_counter()
    B = 16
    for k in range(8, N, B):
        tracker.process_batch(frames[k:k + B], k)
    track_wall = time.perf_counter() - t0
    fps = (N - 8) / track_wall

    est = tracker.trajectory()
    gt = info.gt_poses[: len(est)]
    ate_track = float(ate_rmse(centers_from_poses(est),
                               centers_from_poses(gt)))

    t0 = time.perf_counter()
    res = tracker.global_ba()
    gba_wall = time.perf_counter() - t0
    est2 = tracker.trajectory()
    ate_gba = float(ate_rmse(centers_from_poses(est2),
                             centers_from_poses(gt)))
    t_rmse, r_rmse = rpe(est2, gt)

    inl = [f.num_inliers for f in tracker.frames if f.num_inliers > 0]
    ba_cfg = tracker.cfg.ba
    out = {
        "device": str(jax.devices()[0]),
        "frames": N, "image": "376x1248", "profile": "fast",
        "batch": B,
        "sequence_fps": round(fps, 2),
        "track_wall_s": round(track_wall, 2),
        "keyframes": int(sum(f.is_keyframe for f in tracker.frames)),
        "loop_closures": int(tracker.num_loop_closures),
        "relocalizations": int(tracker.relocalizations),
        "landmarks_live": int(tracker.map.lm_valid.sum()),
        "mean_inliers": round(float(np.mean(inl)), 1) if inl else 0.0,
        "ate_tracked_m": round(ate_track, 4),
        "global_ba": {
            "solver": "schur_mf",
            "cameras": int(res.n_cameras),
            "landmarks": int(res.n_landmarks),
            "observations": int(res.n_observations),
            "initial_cost": float(res.initial_cost),
            "final_cost": float(res.cost),
            "wall_s": round(gba_wall, 2),
            "lm_iters_per_s": round(ba_cfg.iters / max(gba_wall, 1e-9), 2),
        },
        "ate_after_gba_m": round(ate_gba, 4),
        "rpe_trans_m": round(float(t_rmse), 4),
        "rpe_rot_deg": round(float(r_rmse), 4),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "kitti_scale.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
