"""Monocular SLAM tracking loop.

The "tied together" SLAM solution the reference's README promises
(README.md:24) but never builds. Host-side orchestration (this file) is thin
bookkeeping; every compute phase is a jitted fixed-shape device program:

  frontend  detect_and_describe (SIFT/ORB)          models/
  matching  ratio+mutual matcher                    models/matching
  init      essential RANSAC + triangulation        geometry/
  tracking  motion-only LM (PnP refine)             backend/pnp
  mapping   DLT triangulation of new landmarks      geometry/epipolar
  backend   sliding-window Schur BA                 backend/ba

Pose convention: world-to-camera (x_cam = R X_w + t); world frame = first
keyframe. Monocular scale is fixed at two-view init by normalizing median
scene depth to `init_depth`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from visualslam_tpu.backend.ba import BAProblem, run_ba_jit
from visualslam_tpu.backend.pnp import refine_pose_jit
from visualslam_tpu.frontend import detect_and_describe
from visualslam_tpu.geometry import se3, sim3
from visualslam_tpu.geometry.camera import normalized
from visualslam_tpu.geometry.epipolar import triangulate
from visualslam_tpu.geometry.ransac import estimate_relative_pose
from visualslam_tpu.models.matching import match_features
from visualslam_tpu.models.types import Features, Keypoints
from visualslam_tpu.utils.config import SlamConfig


@dataclass
class FrameResult:
    frame_id: int
    R: np.ndarray               # world-to-camera
    t: np.ndarray
    num_matches: int = 0
    num_inliers: int = 0
    is_keyframe: bool = False
    tracking_ok: bool = True


class Tracker:
    """Monocular tracker with sliding-window BA."""

    def __init__(self, cfg: SlamConfig, intrinsics, init_depth: float = 20.0,
                 run_ba: bool = True, loop_closure: bool | None = None):
        from visualslam_tpu.slam.map_state import SlamMap

        if cfg.frontend == "orb" and cfg.match.metric != "hamming":
            # ORB descriptors are bit-packed uint32 — L2 on packed words is
            # meaningless; switch to Hamming automatically
            cfg = cfg.replace(match=cfg.match.replace(metric="hamming"))
        self.cfg = cfg
        self.intr = jnp.asarray(intrinsics, jnp.float32)
        self.init_depth = init_depth
        self.run_ba = run_ba
        if loop_closure is None:
            loop_closure = cfg.loop.enabled
        self.loop_closer = None
        if loop_closure:
            from visualslam_tpu.slam.loop_closure import LoopCloser

            self.loop_closer = LoopCloser(
                intrinsics, cfg.match, cfg.pose_graph,
                sub_keypoints=cfg.loop.sub_keypoints,
                cosine_threshold=cfg.loop.cosine_threshold,
                min_inliers=cfg.loop.min_inliers,
                exclude_recent=cfg.loop.exclude_recent,
                use_sim3=cfg.loop.sim3)
        self.num_loop_closures = 0
        feat_cap = (cfg.sift.max_keypoints if cfg.frontend == "sift"
                    else cfg.orb.max_keypoints)
        self.map = SlamMap(cfg.ba.max_cameras, cfg.ba.max_landmarks, feat_cap)
        self.frames: list[FrameResult] = []
        self._prev_feats: Optional[Features] = None
        self._frames_since_kf = 0
        self._last_R = np.eye(3, dtype=np.float32)
        self._last_t = np.zeros(3, np.float32)
        self._vel = np.zeros(6, np.float32)  # constant-velocity model (twist)
        self._lost_streak = 0
        self.relocalizations = 0       # recoveries (re-init or db reloc)
        self.db_relocalizations = 0    # recoveries that PnP'd into the db
        self.max_lost_frames = 5  # consecutive failures before re-init

        self._frontend = jax.jit(
            lambda im: detect_and_describe(im, cfg))
        self._match = jax.jit(
            lambda fa, fb: match_features(fa, fb, cfg.match))
        self._ransac = jax.jit(
            lambda x1, x2, v, k: estimate_relative_pose(
                x1, x2, v, cfg.ransac, k))
        self._key = jax.random.PRNGKey(cfg.ransac.seed)

    # ------------------------------------------------------------------

    def process(self, img: np.ndarray, frame_id: int) -> FrameResult:
        feats = self._frontend(jnp.asarray(img, jnp.float32))
        return self.process_features(feats, frame_id)

    def detect_batch(self, imgs: np.ndarray) -> Features:
        """Batched detection: [B, H, W] -> Features with leading batch axis.

        One TPU execution for B frames (amortizes dispatch overhead; see
        bench.py notes). Slice per-frame Features with `features_at`."""
        if not hasattr(self, "_frontend_batched"):
            self._frontend_batched = jax.jit(jax.vmap(self._frontend))
        return self._frontend_batched(jnp.asarray(imgs, jnp.float32))

    @staticmethod
    def features_at(batched: Features, i: int) -> Features:
        """Extract frame i's Features from a batched Features pytree."""
        return jax.tree_util.tree_map(lambda x: x[i], batched)

    def process_batch(self, imgs: np.ndarray, first_frame_id: int):
        """Detect a batch in one device call, then track frame by frame."""
        feats_b = self.detect_batch(imgs)
        return [self.process_features(self.features_at(feats_b, i),
                                      first_frame_id + i)
                for i in range(imgs.shape[0])]

    def process_features(self, feats: Features, frame_id: int) -> FrameResult:
        """Run tracking on precomputed Features (lets tests and alternative
        frontends bypass detection)."""
        if not self.map.kf_order:
            return self._bootstrap(feats, frame_id)
        if not self.map.lm_valid.any():
            return self._two_view_init(feats, frame_id)
        return self._track(feats, frame_id)

    # ------------------------------------------------------------------

    def _store_result(self, frame_id, R, t, **kw) -> FrameResult:
        # copy=True: R/t may be views into the keyframe ring buffer, whose
        # slots get overwritten after eviction — history must not alias it
        res = FrameResult(frame_id=frame_id,
                          R=np.array(R, np.float32, copy=True),
                          t=np.array(t, np.float32, copy=True), **kw)
        self.frames.append(res)
        self._last_R = res.R
        self._last_t = res.t
        return res

    def _new_keyframe(self, feats: Features, frame_id, R, t):
        slot, _ = self.map.allocate_keyframe()
        self.map.set_keyframe(
            slot, frame_id, np.asarray(R), np.asarray(t),
            feats.descriptors, np.asarray(feats.keypoints.yx),
            np.asarray(feats.keypoints.valid))
        self._prev_feats = feats
        self._frames_since_kf = 0
        return slot

    def _bootstrap(self, feats, frame_id) -> FrameResult:
        R = np.eye(3, dtype=np.float32)
        t = np.zeros(3, np.float32)
        self._new_keyframe(feats, frame_id, R, t)
        return self._store_result(frame_id, R, t, is_keyframe=True)

    # ------------------------------------------------------------------

    def _two_view_init(self, feats, frame_id) -> FrameResult:
        kf = self.map.last_keyframe_slot()
        prev = self._prev_feats
        m = self._match(prev, feats)
        uv1 = prev.keypoints.yx[m.idx_a][:, ::-1]
        uv2 = feats.keypoints.yx[m.idx_b][:, ::-1]
        x1 = normalized(uv1, self.intr)
        x2 = normalized(uv2, self.intr)
        self._key, sub = jax.random.split(self._key)
        R, t, X, inl, n = self._ransac(x1, x2, m.valid, sub)
        n = int(n)
        if n < self.cfg.keyframe_min_inliers:
            # not enough parallax/matches yet; keep waiting — but if the
            # bootstrap frame itself is bad (sustained failure), re-anchor
            # the bootstrap on the current frame
            self._lost_streak += 1
            if self._lost_streak > self.max_lost_frames:
                self._recover(feats, frame_id)
            return self._store_result(frame_id, self._last_R, self._last_t,
                                      num_matches=int(m.count()),
                                      num_inliers=n, tracking_ok=False)
        self._lost_streak = 0
        # fix monocular scale: median depth of inliers -> init_depth
        X = np.asarray(X)
        inl_np = np.asarray(inl)
        depth = np.median(X[inl_np, 2])
        s = self.init_depth / max(depth, 1e-6)
        X = X * s                       # points in the FIRST keyframe's frame
        t_rel = np.asarray(t) * s
        R_rel = np.asarray(R)
        # compose with the first keyframe's (possibly non-identity after a
        # re-initialization) world pose: T2 = T_rel . T_kf1, X_w = T_kf1^-1 X
        R1 = self.map.kf_R[kf]
        t1 = self.map.kf_t[kf]
        R = R_rel @ R1
        t = R_rel @ t1 + t_rel
        X = (X - t1) @ R1

        # register landmarks + observations in both keyframes
        idx_a = np.asarray(m.idx_a)[inl_np]
        idx_b = np.asarray(m.idx_b)[inl_np]
        lm_idx = self.map.allocate_landmarks(X[inl_np])
        uv1_in = np.asarray(x1)[inl_np]
        uv2_in = np.asarray(x2)[inl_np]
        self.map.add_observations(kf, lm_idx, uv1_in)
        self.map.kf_kp_lm[kf][idx_a] = lm_idx

        slot = self._new_keyframe(feats, frame_id, R, t)
        self.map.add_observations(slot, lm_idx, uv2_in)
        self.map.kf_kp_lm[slot][idx_b] = lm_idx
        self._run_window_ba()
        if self.loop_closer is not None:
            self.loop_closer.add_keyframe(
                self.map.kf_frame_id[kf], self.map.kf_R[kf],
                self.map.kf_t[kf], prev, self.map.kf_kp_lm[kf], self.map.X)
            self.loop_closer.add_keyframe(
                frame_id, self.map.kf_R[slot], self.map.kf_t[slot], feats,
                self.map.kf_kp_lm[slot], self.map.X)
        return self._store_result(frame_id, self.map.kf_R[slot],
                                  self.map.kf_t[slot],
                                  num_matches=int(m.count()), num_inliers=n,
                                  is_keyframe=True)

    # ------------------------------------------------------------------

    def _track(self, feats, frame_id) -> FrameResult:
        kf = self.map.last_keyframe_slot()
        prev = self._prev_feats
        m = self._match(prev, feats)
        mv = np.asarray(m.valid)
        idx_a = np.asarray(m.idx_a)
        idx_b = np.asarray(m.idx_b)

        # split matches: tracked landmarks (3D-2D) vs new (2D-2D)
        kp_lm = self.map.kf_kp_lm[kf]
        lm_of_match = np.where(mv, kp_lm[idx_a], -1)
        has_lm = lm_of_match >= 0

        M = len(idx_a)
        uv2 = np.asarray(feats.keypoints.yx)[idx_b][:, ::-1]
        x2 = np.asarray(normalized(jnp.asarray(uv2), self.intr))
        Xw = self.map.X[np.maximum(lm_of_match, 0)]

        # constant-velocity pose prediction
        dR, dt = se3.se3_exp(jnp.asarray(self._vel))
        R0 = np.asarray(dR) @ self._last_R
        t0 = np.asarray(dR) @ self._last_t + np.asarray(dt)

        pr = refine_pose_jit(jnp.asarray(R0), jnp.asarray(t0),
                             jnp.asarray(Xw), jnp.asarray(x2),
                             jnp.asarray(has_lm))
        n_inl = int(pr.num_inliers)
        ok = n_inl >= max(10, self.cfg.keyframe_min_inliers // 3)
        if not ok:
            # Failure recovery (SURVEY.md §5): after a sustained loss the
            # map is unusable from here — drop it and re-bootstrap from the
            # current frame (trajectory continues dead-reckoned through the
            # gap; a fresh two-view init restarts mapping).
            self._lost_streak += 1
            if self._lost_streak > self.max_lost_frames:
                from_db = self._recover(feats, frame_id)
                return self._store_result(frame_id, self._last_R,
                                          self._last_t,
                                          num_matches=int(mv.sum()),
                                          num_inliers=0, is_keyframe=True,
                                          tracking_ok=from_db)
        else:
            self._lost_streak = 0
        if ok:
            R, t = np.asarray(pr.R), np.asarray(pr.t)
            # update velocity model: vel = log(T_new T_old^-1)
            Ri, ti = se3.inverse(jnp.asarray(self._last_R),
                                 jnp.asarray(self._last_t))
            Rrel, trel = se3.compose(jnp.asarray(R), jnp.asarray(t), Ri, ti)
            self._vel = np.asarray(se3.se3_log(Rrel, trel))
        else:
            R, t = R0, t0  # fall back to prediction

        self._frames_since_kf += 1
        need_kf = (n_inl < self.cfg.keyframe_min_inliers
                   or self._frames_since_kf >= self.cfg.keyframe_max_gap)
        is_kf = False
        if need_kf and ok:
            is_kf = True
            self._make_keyframe_from_tracking(
                feats, frame_id, R, t, m, lm_of_match, np.asarray(pr.inliers),
                x2)
        return self._store_result(frame_id, R, t,
                                  num_matches=int(mv.sum()),
                                  num_inliers=n_inl, is_keyframe=is_kf,
                                  tracking_ok=ok)

    # ------------------------------------------------------------------

    def _recover(self, feats, frame_id) -> bool:
        """Sustained-loss recovery: first try ORB-SLAM-style relocalization
        (PnP against the keyframe database via LoopCloser.relocalize) so the
        new map segment re-anchors at a map-consistent pose; fall back to
        re-bootstrapping at the dead-reckoned last pose. Returns True when
        the pose came from the database."""
        from_db = False
        if self.loop_closer is not None:
            r = self.loop_closer.relocalize(feats)
            if r is not None:
                R, t, _, _ = r
                self._last_R = np.array(R, np.float32, copy=True)
                self._last_t = np.array(t, np.float32, copy=True)
                self.db_relocalizations += 1
                from_db = True
        self._reinitialize(feats, frame_id)
        self._lost_streak = 0
        self.relocalizations += 1
        return from_db

    def _reinitialize(self, feats, frame_id) -> None:
        """Drop the map and re-bootstrap from the current frame at the last
        known pose (keeps the trajectory frame; mapping restarts)."""
        from visualslam_tpu.slam.map_state import SlamMap

        feat_cap = (self.cfg.sift.max_keypoints
                    if self.cfg.frontend == "sift"
                    else self.cfg.orb.max_keypoints)
        self.map = SlamMap(self.cfg.ba.max_cameras,
                           self.cfg.ba.max_landmarks, feat_cap)
        self._vel = np.zeros(6, np.float32)
        self._new_keyframe(feats, frame_id, self._last_R, self._last_t)

    def _make_keyframe_from_tracking(self, feats, frame_id, R, t, m,
                                     lm_of_match, pnp_inliers, x2_all):
        prev_kf = self.map.last_keyframe_slot()
        prev_R = self.map.kf_R[prev_kf].copy()
        prev_t = self.map.kf_t[prev_kf].copy()
        prev_kp_lm = self.map.kf_kp_lm[prev_kf]
        mv = np.asarray(m.valid)
        idx_a = np.asarray(m.idx_a)
        idx_b = np.asarray(m.idx_b)

        slot = self._new_keyframe(feats, frame_id, R, t)

        # 1. observations of tracked landmarks
        tracked = (lm_of_match >= 0) & pnp_inliers & mv
        if tracked.any():
            self.map.add_observations(slot, lm_of_match[tracked],
                                      x2_all[tracked])
            self.map.kf_kp_lm[slot][idx_b[tracked]] = lm_of_match[tracked]

        # 2. triangulate new landmarks from unassociated 2D-2D matches
        new2d = mv & (lm_of_match < 0)
        if new2d.sum() >= 8:
            uv1 = self.map.kf_yx[prev_kf][idx_a][:, ::-1]
            x1 = np.asarray(normalized(jnp.asarray(uv1), self.intr))
            # relative pose prev_kf -> current
            Rpi, tpi = se3.inverse(jnp.asarray(prev_R), jnp.asarray(prev_t))
            Rrel, trel = se3.compose(jnp.asarray(R), jnp.asarray(t), Rpi, tpi)
            Xc1 = np.asarray(triangulate(Rrel, trel, jnp.asarray(x1),
                                         jnp.asarray(x2_all)))
            # to world: X_w = R_prev^T (X_c1 - t_prev)
            Xw = (Xc1 - prev_t) @ prev_R
            # accept: in front of both cams, bounded depth, low reprojection
            z1 = Xc1[:, 2]
            Xc2 = Xw @ np.asarray(R).T + np.asarray(t)
            z2 = Xc2[:, 2]
            r1 = np.linalg.norm(Xc1[:, :2] / np.maximum(z1[:, None], 1e-6)
                                - x1, axis=1)
            r2 = np.linalg.norm(Xc2[:, :2] / np.maximum(z2[:, None], 1e-6)
                                - x2_all, axis=1)
            # parallax check: ray angle between the two views
            good = (new2d & (z1 > 1e-3) & (z2 > 1e-3)
                    & (z1 < self.init_depth * 20)
                    & (r1 < 6e-3) & (r2 < 6e-3))
            if good.any():
                lm_idx = self.map.allocate_landmarks(Xw[good])
                self.map.add_observations(prev_kf, lm_idx, x1[good])
                self.map.add_observations(slot, lm_idx, x2_all[good])
                self.map.kf_kp_lm[prev_kf][idx_a[good]] = lm_idx
                self.map.kf_kp_lm[slot][idx_b[good]] = lm_idx

        # 3. windowed BA
        if self.run_ba:
            self._run_window_ba()
        # refresh cached current pose from (possibly) adjusted keyframe
        self._last_R = self.map.kf_R[slot].copy()
        self._last_t = self.map.kf_t[slot].copy()

        # 4. loop closure
        if self.loop_closer is not None:
            idx = self.loop_closer.add_keyframe(
                frame_id, self.map.kf_R[slot], self.map.kf_t[slot], feats,
                self.map.kf_kp_lm[slot], self.map.X)
            edge = self.loop_closer.detect(idx)
            if edge is not None:
                self.num_loop_closures += 1
                self.loop_closer.optimize()
                self._apply_loop_correction(slot, idx)

    def _apply_loop_correction(self, slot: int, db_idx: int) -> None:
        """Move the active window (poses + landmarks) so the latest keyframe
        matches its pose-graph-corrected pose.

        The loop closer provides the world-side Sim(3) correction
        G = S_corr^-1 . S_old of the latest keyframe (sg == 1 in SE(3)
        mode). Landmarks: X' = G X; window poses T' = descale(S_T . G^-1),
        which maps the last keyframe exactly onto its corrected pose while
        preserving each camera's view of the (corrected) landmarks.
        Database entries were already propagated inside optimize()."""
        lc = self.loop_closer
        if lc.last_corrections is None or db_idx >= len(lc.last_corrections):
            return
        Rg, tg, sg = lc.last_corrections[db_idx]
        Rgi, tgi, sgi = (np.asarray(a) for a in sim3.inverse(
            jnp.asarray(Rg), jnp.asarray(tg), jnp.asarray(np.float32(sg))))
        sgi = float(sgi)
        # landmarks: X' = G X = sg Rg X + tg
        live = self.map.lm_valid
        self.map.X[live] = sg * (self.map.X[live] @ Rg.T) + tg
        # window poses: S' = (R_k, t_k, 1) . G^-1, then de-scale (R', t'/s')
        for s in self.map.kf_order:
            R_k = self.map.kf_R[s]
            t_k = self.map.kf_t[s]
            self.map.kf_R[s] = R_k @ Rgi
            self.map.kf_t[s] = (R_k @ tgi + t_k) / sgi
        self._last_R = self.map.kf_R[slot].copy()
        self._last_t = self.map.kf_t[slot].copy()

    # ------------------------------------------------------------------

    def metrics(self) -> list:
        """Structured per-frame metrics (SURVEY.md §5 observability) —
        serialize as JSON lines for offline analysis."""
        out = []
        for f in self.frames:
            out.append({
                "frame": int(f.frame_id),
                "matches": int(f.num_matches),
                "inliers": int(f.num_inliers),
                "keyframe": bool(f.is_keyframe),
                "tracking_ok": bool(f.tracking_ok),
            })
        if out:
            out[-1]["landmarks"] = int(self.map.lm_valid.sum())
            out[-1]["keyframes"] = len(self.map.kf_order)
            out[-1]["loop_closures"] = self.num_loop_closures
            out[-1]["relocalizations"] = self.relocalizations
            out[-1]["db_relocalizations"] = self.db_relocalizations
            out[-1]["last_ba_cost"] = self.last_ba_cost
        return out

    last_ba_cost: float = -1.0

    def _run_window_ba(self) -> None:
        cfg = self.cfg.ba
        (slots, R, t, lm_slots, X, cam_idx, lm_idx, uv,
         valid) = self.map.build_ba_arrays(cfg.max_observations)
        if len(lm_slots) < 8 or valid.sum() < 24:
            return
        C = cfg.max_cameras
        L = cfg.max_landmarks
        nC = len(slots)
        nL = len(lm_slots)
        if nL > L:
            return  # window exceeds capacity; skip (shouldn't happen)
        padC = C - nC
        padL = L - nL
        p = BAProblem(
            R=jnp.asarray(np.concatenate(
                [R, np.tile(np.eye(3, dtype=np.float32), (padC, 1, 1))])),
            t=jnp.asarray(np.concatenate([t, np.zeros((padC, 3), np.float32)])),
            X=jnp.asarray(np.concatenate([X, np.zeros((padL, 3), np.float32)])),
            cam_idx=jnp.asarray(cam_idx, jnp.int32),
            lm_idx=jnp.asarray(lm_idx, jnp.int32),
            uv=jnp.asarray(uv, jnp.float32),
            obs_valid=jnp.asarray(valid),
            cam_valid=jnp.asarray(np.arange(C) < nC),
            lm_valid=jnp.asarray(np.arange(L) < nL),
        )
        res = run_ba_jit(p, cfg)
        self.last_ba_cost = float(res.cost)
        self.map.writeback_ba(slots, lm_slots,
                              np.asarray(res.R[:nC]), np.asarray(res.t[:nC]),
                              np.asarray(res.X[:nL]))

    # ------------------------------------------------------------------

    def trajectory(self) -> np.ndarray:
        """[F, 3, 4] camera-to-world pose matrices (KITTI convention)."""
        out = []
        for f in self.frames:
            Rcw = f.R.T
            c = -f.R.T @ f.t
            out.append(np.concatenate([Rcw, c[:, None]], axis=1))
        return np.stack(out)

    def keyframe_trajectory(self) -> tuple[np.ndarray, np.ndarray]:
        """(frame_ids [K], poses [K, 3, 4]) over keyframes — pose-graph-
        corrected when loop closure has run, odometry otherwise."""
        if self.loop_closer is None or not self.loop_closer.entries:
            ids = [f.frame_id for f in self.frames if f.is_keyframe]
            poses = [p for f, p in zip(self.frames, self.trajectory())
                     if f.is_keyframe]
            return np.asarray(ids), (np.stack(poses) if poses
                                     else np.zeros((0, 3, 4)))
        lc = self.loop_closer
        if lc.corrected is None:
            pairs = [(e.R, e.t) for e in lc.entries]
        else:
            pairs = lc.corrected
        ids = np.asarray([e.frame_id for e in lc.entries])
        poses = np.stack([
            np.concatenate([R.T, (-R.T @ t)[:, None]], axis=1)
            for R, t in pairs])
        return ids, poses
