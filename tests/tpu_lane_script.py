"""TPU lane payload — run in a FRESH interpreter (no CPU pin) by
tests/test_tpu_lane.py. Exercises, on the real TPU backend:

  1. every Pallas kernel (distance 2-NN, extrema, fused orientation/
     descriptor, blur) compiled + executed,
     checked against its XLA equivalent;
  2. one full detect_and_describe on a bundled reference image;
  3. one fused track_step_lite + keyframe_step on synthetic features;
  4. one packed window-BA solve.

Prints one "TPU_LANE_OK <json>" line on success; any exception exits
non-zero. SURVEY.md §4 implication (4): CPU-mesh tests PLUS the same
paths re-run on real TPU — round 2 shipped a Pallas kernel that did not
even compile on TPU because nothing ran there."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"TPU_LANE_SKIP backend={backend}")
        return

    out = {"backend": backend, "device": str(jax.devices()[0])}
    rng = np.random.default_rng(0)

    # ---- 1a. Pallas distance 2-NN vs dense numpy ---------------------
    from visualslam_tpu.ops.pallas.distance import pallas_l2_2nn
    from visualslam_tpu.models.types import Features, Keypoints

    a = rng.normal(size=(512, 128)).astype(np.float32)
    b = rng.normal(size=(512, 128)).astype(np.float32)
    best, second, i1 = (np.asarray(x) for x in pallas_l2_2nn(
        jnp.asarray(a), jnp.asarray(b)))
    d_full = ((a[:, None] - b[None]) ** 2).sum(-1)
    # the kernel's ||a||^2+||b||^2-2ab expansion rounds differently from
    # the direct (a-b)^2 sum in f32 — argmins flip on ~1e-4-relative ties
    # (measured 3/512 on random normals); distances must agree to rtol
    agree = (i1 == d_full.argmin(1)).mean()
    assert agree > 0.98, f"pallas 2-NN argmin agreement {agree}"
    assert np.allclose(best, d_full.min(1), rtol=2e-3, atol=1e-2), \
        "pallas 2-NN dist"
    out["pallas_distance"] = f"ok (argmin agreement {agree:.4f})"

    # ---- 1b. Pallas extrema kernel vs XLA ----------------------------
    from visualslam_tpu.ops.pallas.extrema import pallas_extrema_score
    from visualslam_tpu.ops.extrema import extrema_mask

    dog = jnp.asarray(rng.normal(0, 0.05, (5, 192, 256)).astype(np.float32))
    th = 0.03
    s_pl = np.asarray(pallas_extrema_score(dog, th))
    m_xla = np.asarray(extrema_mask(dog) & (jnp.abs(dog) > 0.5 * th))
    assert ((s_pl > -1e29) == m_xla).all(), "pallas extrema mask mismatch"
    assert np.allclose(s_pl[m_xla], np.abs(np.asarray(dog))[m_xla]), \
        "pallas extrema score mismatch"
    out["pallas_extrema"] = "ok"

    # ---- 1b2. DEFAULT fused extrema+candidate-select kernel on chip ---
    # (VERDICT r4 item 7: the fused kernel is the TPU default but only the
    # losing score-only arm had an explicit on-chip numeric check). The
    # fused reduce keeps at most one extremum per (tile_h x 1 x 1) region,
    # so assert no-fabrication + exact scores + sane coverage, not set
    # equality.
    from visualslam_tpu.ops.pallas.extrema import pallas_extrema_candidates

    lvl_f, y_f, x_f, sc_f, sel_f = (np.asarray(v) for v in
                                    pallas_extrema_candidates(dog, th, 256))
    n_sel = int(sel_f.sum())
    dog_np = np.asarray(dog)
    assert n_sel > 0, "fused extrema selected nothing"
    for L, Y, X, S in zip(lvl_f[sel_f], y_f[sel_f], x_f[sel_f],
                          sc_f[sel_f]):
        assert m_xla[L, Y, X], f"fused fabricated non-extremum {(L, Y, X)}"
        assert abs(S - abs(dog_np[L, Y, X])) < 1e-5, "fused score wrong"
    # the region reduce may drop vertically stacked extrema, but must keep
    # a solid fraction of the dense-mask candidates at this density
    assert n_sel >= 0.5 * min(256, int(m_xla.sum())), \
        f"fused kept only {n_sel} of {int(m_xla.sum())} extrema"
    out["pallas_extrema_fused"] = f"ok ({n_sel} candidates)"

    # ---- 1c. fused orientation/descriptor kernels vs XLA stages ------
    from visualslam_tpu.ops.histograms import gaussian_window, soft_histogram
    from visualslam_tpu.ops.pallas.descriptor import (
        pallas_descriptor, pallas_orient_hist)
    from visualslam_tpu.ops.patches import (
        crop_patches, rotated_grid, tent_sample_patches)

    Kd = 48
    stack = rng.random((3, 96, 200, 2)).astype(np.float32)
    stack[..., 1] *= 360.0
    yxs = np.stack([rng.integers(10, 86, Kd), rng.integers(10, 190, Kd)],
                   -1).astype(np.float32)
    lvls = rng.integers(0, 3, Kd).astype(np.int32)
    patches, py0, px0 = crop_patches(jnp.asarray(stack), jnp.asarray(lvls),
                                     jnp.asarray(yxs), 28)
    sig = jnp.asarray(1.5 + rng.random(Kd).astype(np.float32) * 3.0)
    h_k = np.asarray(pallas_orient_hist(patches, py0, px0,
                                        jnp.asarray(yxs), sig, 36))
    offs = jnp.arange(16, dtype=jnp.float32) - 8
    gy, gx = jnp.meshgrid(offs, offs, indexing="ij")
    grid = jnp.stack([gy, gx], axis=-1)[None]
    both = tent_sample_patches(patches, py0, px0,
                               jnp.asarray(yxs)[:, None, None, :] + grid)
    w = gaussian_window(16, sig)
    h_x = np.asarray(soft_histogram(both[..., 1].reshape(Kd, -1),
                                    (both[..., 0] * w).reshape(Kd, -1),
                                    36, 360.0))
    assert np.allclose(h_k, h_x, rtol=1e-3, atol=1e-3), "orient kernel"
    ang = jnp.asarray(rng.random(Kd).astype(np.float32) * 360.0)
    d_k = np.asarray(pallas_descriptor(patches, py0, px0,
                                       jnp.asarray(yxs), ang, 4, 8))
    coords = rotated_grid(jnp.asarray(yxs), ang, 16)
    both2 = tent_sample_patches(patches, py0, px0, coords)
    rel = jnp.mod(both2[..., 1] - ang[:, None, None], 360.0)
    ws = gaussian_window(16, 8.0)

    def _reg(a):
        a = a.reshape(Kd, 4, 4, 4, 4)
        return a.transpose(0, 1, 3, 2, 4).reshape(Kd, 16, 16)

    d_x = np.asarray(soft_histogram(
        _reg(rel), _reg(both2[..., 0] * ws[None]), 8, 360.0)).reshape(Kd, -1)
    assert np.allclose(d_k, d_x, rtol=1e-3, atol=1e-3), "descriptor kernel"
    out["pallas_descriptor"] = "ok"

    # ---- 1d. Pallas blur kernel vs XLA blur (matmul path) ------------
    # reference = blur_stack_matmul (the pyramid default): on TPU the
    # conv_general path runs MXU bf16 passes (~2.6e-3 off scipy) while
    # both the matmul path and the kernel are scipy-exact (~2e-7)
    from visualslam_tpu.ops.blur import blur_stack_matmul
    from visualslam_tpu.ops.pallas.blur import pallas_blur_stack

    im_b = jnp.asarray(rng.random((96, 200)).astype(np.float32))
    sig_b = (1.2, 2.0)
    b_pl = np.asarray(pallas_blur_stack(im_b, sig_b))
    b_xla = np.asarray(blur_stack_matmul(im_b, sig_b))
    assert np.allclose(b_pl, b_xla, rtol=1e-4, atol=1e-4), "blur kernel"
    out["pallas_blur"] = "ok"

    # ---- 2. full frontend on a bundled reference image ---------------
    from visualslam_tpu.frontend import detect_and_describe_jit
    from visualslam_tpu.utils.config import FAST_CONFIG
    from visualslam_tpu.utils.images import load_gray

    img = load_gray("/root/reference/KeyPointDetection/images/home.jpg")
    feats = detect_and_describe_jit(jnp.asarray(img), FAST_CONFIG)
    n = int(feats.keypoints.count())
    assert n > 50, f"frontend found only {n} keypoints"
    out["frontend_keypoints"] = n

    # ---- 3. fused track step + keyframe step -------------------------
    from visualslam_tpu.slam.track_step import (
        KeyframeRef, LocalMap, TrackState, track_step_jit)
    from visualslam_tpu.utils.config import FAST_CONFIG as cfg

    K = cfg.sift.max_keypoints
    Kl = cfg.local_map_size
    D = 128
    desc = rng.normal(size=(K, D)).astype(np.float32)
    kf = KeyframeRef(desc=jnp.asarray(desc),
                     yx=jnp.asarray(rng.uniform(0, 300, (K, 2)), jnp.float32),
                     kp_valid=jnp.ones(K, bool),
                     kp_has_lm=jnp.zeros(K, bool),
                     R=jnp.eye(3), t=jnp.zeros(3))
    lmap = LocalMap(desc=jnp.asarray(rng.normal(size=(Kl, D)),
                                     jnp.float32),
                    X=jnp.asarray(rng.normal(size=(Kl, 3)), jnp.float32),
                    valid=jnp.ones(Kl, bool))
    feats_t = Features(
        Keypoints.empty(K)._replace(
            yx=jnp.asarray(rng.uniform(0, 300, (K, 2)), jnp.float32),
            valid=jnp.ones(K, bool)),
        jnp.asarray(desc))
    st = TrackState(R=jnp.eye(3), t=jnp.zeros(3), vel=jnp.zeros(6))
    intr = jnp.asarray([300.0, 300.0, 150.0, 150.0])
    res = track_step_jit(kf, lmap, feats_t, st, intr, cfg, 10, 400.0)
    stats = np.asarray(res.stats)
    assert stats.shape == (22,) and np.isfinite(stats).all()
    out["track_step"] = "ok"

    # ---- 4. packed window BA -----------------------------------------
    from visualslam_tpu.backend.ba import (
        BAProblem, run_ba_packed_jit, unpack_ba_result)
    from visualslam_tpu.utils.config import BAConfig

    bc = BAConfig(max_cameras=4, max_landmarks=64, max_observations=256,
                  iters=3)
    C, L, O = 4, 64, 256
    X = rng.uniform([-2, -2, 4], [2, 2, 8], (L, 3)).astype(np.float32)
    cam_idx = np.repeat(np.arange(C), O // C).astype(np.int32)
    lm_idx = np.tile(np.arange(L), O // L).astype(np.int32)
    t_gt = np.linspace(0, 0.3, C)[:, None] * np.array([1.0, 0, 0])
    uv = np.stack([(X[lm_idx][:, :2] + t_gt[cam_idx][:, :2])
                   / X[lm_idx][:, 2:3][:, 0][:, None]], 1)[:, 0]
    p = BAProblem(
        R=jnp.tile(jnp.eye(3), (C, 1, 1)),
        t=jnp.asarray(t_gt + rng.normal(0, 0.01, (C, 3)), jnp.float32),
        X=jnp.asarray(X + rng.normal(0, 0.05, (L, 3)), jnp.float32),
        cam_idx=jnp.asarray(cam_idx), lm_idx=jnp.asarray(lm_idx),
        uv=jnp.asarray(uv, jnp.float32),
        obs_valid=jnp.ones(O, bool), cam_valid=jnp.ones(C, bool),
        lm_valid=jnp.ones(L, bool))
    packed = run_ba_packed_jit(p, bc)
    R, t, Xo, cost, cost0 = unpack_ba_result(np.asarray(packed), C, L)
    assert np.isfinite(cost) and cost <= cost0, (cost, cost0)
    out["window_ba_cost"] = [cost0, cost]

    # ---- 5. loop closure at bench width (376x1248) -------------------
    # VERDICT r4 item 5: every committed closure was at 240x376 or on the
    # photo path. Two laps of the strafe rectangle: every frame of lap 2
    # is a true revisit of lap 1, so >=2 closures must fire through the
    # engine's mutual-verification gates, without destabilizing tracking.
    from visualslam_tpu.io.kitti import SyntheticSequence
    from visualslam_tpu.slam.evaluation import ate_rmse, centers_from_poses
    from visualslam_tpu.slam.tracker import Tracker

    NL = 256
    lseq = SyntheticSequence(num_frames=NL, h=376, w=1248, n_dots=12000,
                             step=0.4, trajectory="loop", laps=2)
    linfo = lseq.info()
    lframes = np.stack([lseq.frame(k) for k in range(NL)])
    lt = Tracker(FAST_CONFIG, linfo.intrinsics)
    for k in range(0, NL, 16):
        lt.process_stream(lframes[k:k + 16], k)
    lt.finish()
    l_ate = float(ate_rmse(
        centers_from_poses(lt.trajectory()),
        centers_from_poses(linfo.gt_poses[:len(lt.frames)])))
    assert lt.num_loop_closures >= 2, (
        f"only {lt.num_loop_closures} closures at width 1248")
    assert lt.relocalizations == 0, "tracking lost on the loop world"
    assert l_ate < 2.5, f"bench-width loop ATE {l_ate:.2f}"
    out["bench_width_loop"] = {
        "frames": NL, "closures": int(lt.num_loop_closures),
        "ate_m": round(l_ate, 3)}

    print("TPU_LANE_OK " + json.dumps(out))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"TPU_LANE_FAIL {type(e).__name__}: {e}", file=sys.stderr)
        raise
