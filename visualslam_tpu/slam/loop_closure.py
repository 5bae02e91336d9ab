"""Loop-closure detection + pose-graph correction.

The reference's README promises "ultimately these steps are tied together to
create a SLAM solution" (README.md:24) — loop closure is the piece that makes
the tie-together global. Design (TPU-friendly, fixed shapes per call):

  retrieval   every keyframe stores a GLOBAL descriptor (response-weighted
              mean of its local descriptors, L2-normalized). Candidates =
              argmax cosine against all past keyframes outside a temporal
              exclusion window — one [1, D] x [D, N] matvec.
  verify      full local-descriptor matching (ratio+mutual, the standard
              matcher) + PnP: the current keyframe's tracked landmarks give
              3D points; the candidate's matched keypoints give 2D rays ->
              motion-only LM yields the candidate camera's pose in the
              CURRENT world frame, metric scale included (this sidesteps the
              essential matrix's scale ambiguity for monocular loops).
  correct     an SE(3) pose graph over the full keyframe history: odometry
              edges between consecutive keyframes + accepted loop edges,
              optimized with backend/pose_graph; the correction of the
              latest keyframe is applied rigidly to the active window
              (poses + landmarks).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from visualslam_tpu.backend.pnp import refine_pose_jit
from visualslam_tpu.backend.pose_graph import PoseGraph, optimize_pose_graph_jit
from visualslam_tpu.geometry import se3
from visualslam_tpu.models.matching import match_features
from visualslam_tpu.models.types import Features, Keypoints
from visualslam_tpu.utils.config import MatchConfig, PoseGraphConfig


@dataclass
class LoopEdge:
    i: int                  # earlier keyframe index (db order)
    j: int                  # later keyframe index
    R: np.ndarray           # relative pose: T_ij (j in i's frame)
    t: np.ndarray
    num_inliers: int = 0


@dataclass
class KeyframeEntry:
    frame_id: int
    R: np.ndarray           # world-to-camera at insertion (odometry frame)
    t: np.ndarray
    global_desc: np.ndarray  # [D]
    desc: np.ndarray        # [Ks, D] subsampled local descriptors
    yx: np.ndarray          # [Ks, 2]
    lm_world: np.ndarray    # [Ks, 3] associated landmark positions
    has_lm: np.ndarray      # [Ks] bool


class LoopCloser:
    """Keyframe database + loop detection + pose-graph correction."""

    def __init__(self, intrinsics, match_cfg: MatchConfig,
                 pg_cfg: PoseGraphConfig,
                 sub_keypoints: int = 256,
                 cosine_threshold: float = 0.85,
                 min_inliers: int = 25,
                 exclude_recent: int = 10):
        self.intr = np.asarray(intrinsics, np.float32)
        # entries always store float descriptors (ORB bits get unpacked to
        # {0,1} floats, where L2 == 2x Hamming), so match on L2 regardless
        # of the tracker's metric
        self.match_cfg = match_cfg.replace(max_matches=sub_keypoints,
                                           metric="l2")
        self.pg_cfg = pg_cfg
        self.sub = sub_keypoints
        self.cos_thresh = cosine_threshold
        self.min_inliers = min_inliers
        self.exclude = exclude_recent
        self.entries: List[KeyframeEntry] = []
        self.loop_edges: List[LoopEdge] = []
        # optimized poses (filled by optimize); None until first loop
        self.corrected: Optional[list] = None

    # ------------------------------------------------------------------

    @staticmethod
    def global_descriptor(desc: np.ndarray, response: np.ndarray,
                          valid: np.ndarray) -> np.ndarray:
        w = np.where(valid, np.maximum(response, 1e-6), 0.0)
        g = (desc * w[:, None]).sum(0)
        n = np.linalg.norm(g)
        return (g / n if n > 1e-9 else g).astype(np.float32)

    def add_keyframe(self, frame_id: int, R, t, feats: Features,
                     kp_lm: np.ndarray, lm_positions: np.ndarray) -> int:
        """Register a keyframe. kp_lm: [K] landmark index per keypoint (-1
        if none); lm_positions: the global landmark array to snapshot from.
        Returns the database index."""
        desc = np.asarray(feats.descriptors)
        if desc.dtype == np.uint32:
            # bit-packed (ORB): unpack to {0,1} float bits — L2 on bit
            # vectors is Hamming, so the standard matcher/global-descriptor
            # machinery applies unchanged
            desc = np.unpackbits(
                desc.view(np.uint8), bitorder="little").reshape(
                desc.shape[0], -1).astype(np.float32)
        else:
            desc = desc.astype(np.float32)
        valid = np.asarray(feats.keypoints.valid)
        resp = np.asarray(feats.keypoints.response)
        yx = np.asarray(feats.keypoints.yx)
        order = np.argsort(np.where(valid, -resp, np.inf))[: self.sub]
        has_lm = kp_lm[order] >= 0
        entry = KeyframeEntry(
            frame_id=frame_id,
            R=np.array(R, np.float32, copy=True),
            t=np.array(t, np.float32, copy=True),
            global_desc=self.global_descriptor(desc, resp, valid),
            desc=desc[order].copy(),
            yx=yx[order].copy(),
            lm_world=lm_positions[np.maximum(kp_lm[order], 0)].astype(
                np.float32),
            has_lm=has_lm & valid[order],
        )
        self.entries.append(entry)
        return len(self.entries) - 1

    # ------------------------------------------------------------------

    def detect(self, j: int) -> Optional[LoopEdge]:
        """Try to close a loop for keyframe j against the database."""
        n = len(self.entries)
        if j != n - 1 or n <= self.exclude + 1:
            return None
        cur = self.entries[j]
        past = np.stack([e.global_desc for e in
                         self.entries[: n - self.exclude - 1]])
        sims = past @ cur.global_desc
        i = int(np.argmax(sims))
        if sims[i] < self.cos_thresh:
            return None
        edge = self._verify(i, j)
        if edge is not None:
            self.loop_edges.append(edge)
        return edge

    def _verify(self, i: int, j: int) -> Optional[LoopEdge]:
        """Geometric verification: match + PnP of candidate i against the
        current keyframe j's landmarks (metric scale preserved)."""
        a = self.entries[j]   # current (has fresh landmarks)
        b = self.entries[i]   # candidate

        def to_feats(e: KeyframeEntry) -> Features:
            k = e.desc.shape[0]
            kps = Keypoints.empty(k)._replace(
                yx=jnp.asarray(e.yx), valid=jnp.ones(k, bool))
            return Features(kps, jnp.asarray(e.desc))

        m = match_features(to_feats(a), to_feats(b), self.match_cfg)
        mv = np.asarray(m.valid)
        ia = np.asarray(m.idx_a)
        ib = np.asarray(m.idx_b)
        usable = mv & a.has_lm[ia]
        if usable.sum() < self.min_inliers:
            return None

        X = a.lm_world[ia]                        # [M, 3] current-world
        uv_b = b.yx[ib][:, ::-1]                  # (x, y) pixels in candidate
        fx, fy, cx, cy = self.intr
        x_b = np.stack([(uv_b[:, 0] - cx) / fx, (uv_b[:, 1] - cy) / fy], -1)

        pr = refine_pose_jit(jnp.asarray(b.R), jnp.asarray(b.t),
                             jnp.asarray(X), jnp.asarray(x_b, jnp.float32),
                             jnp.asarray(usable))
        n_inl = int(pr.num_inliers)
        if n_inl < self.min_inliers:
            return None
        # candidate pose in current world frame
        Rb = np.asarray(pr.R)
        tb = np.asarray(pr.t)
        # loop edge: T_ij = T_i(world_cur) . T_j^-1 ... pose of j in i frame:
        # T_i = (Rb, tb) maps world->cam_i; T_j = (a.R, a.t) world->cam_j
        # relative (i frame): T_ij = T_i . T_j^-1
        Rji, tji = se3.inverse(jnp.asarray(a.R), jnp.asarray(a.t))
        Rrel, trel = se3.compose(jnp.asarray(Rb), jnp.asarray(tb), Rji, tji)
        # store as pose of j expressed in i: T_ij = (T_i T_j^-1)^-1
        Rij, tij = se3.inverse(Rrel, trel)
        return LoopEdge(i=i, j=j, R=np.asarray(Rij), t=np.asarray(tij),
                        num_inliers=n_inl)

    # ------------------------------------------------------------------

    def optimize(self) -> Optional[np.ndarray]:
        """Pose-graph optimization over the full keyframe history.

        Returns corrected camera-to-world centers [N, 3] (and caches full
        corrected poses in self.corrected) or None if too small."""
        n = len(self.entries)
        if n < 3:
            return None
        N = self.pg_cfg.max_nodes
        E = self.pg_cfg.max_edges
        if n > N:
            return None

        R0 = np.stack([e.R for e in self.entries])
        t0 = np.stack([e.t for e in self.entries])

        ii, jj, Rm, tm, w = [], [], [], [], []
        for k in range(n - 1):
            Rr, tr = se3.relative(jnp.asarray(R0[k]), jnp.asarray(t0[k]),
                                  jnp.asarray(R0[k + 1]),
                                  jnp.asarray(t0[k + 1]))
            ii.append(k)
            jj.append(k + 1)
            Rm.append(np.asarray(Rr))
            tm.append(np.asarray(tr))
            w.append(1.0)
        for e in self.loop_edges:
            ii.append(e.i)
            jj.append(e.j)
            Rm.append(e.R)
            tm.append(e.t)
            w.append(2.0)
        ne = len(ii)
        if ne > E:
            return None

        def pad(a, target, shape_tail):
            out = np.zeros((target,) + shape_tail, np.float32)
            out[: len(a)] = np.asarray(a)
            return out

        g = PoseGraph(
            R=jnp.asarray(pad(R0, N, (3, 3))
                          + np.tile(np.eye(3, dtype=np.float32), (N, 1, 1))
                          * (np.arange(N) >= n)[:, None, None]),
            t=jnp.asarray(pad(t0, N, (3,))),
            node_valid=jnp.asarray(np.arange(N) < n),
            i=jnp.asarray(pad(ii, E, ()).astype(np.int32)),
            j=jnp.asarray(pad(jj, E, ()).astype(np.int32)),
            Rm=jnp.asarray(pad(Rm, E, (3, 3))
                           + np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
                           * (np.arange(E) >= ne)[:, None, None]),
            tm=jnp.asarray(pad(tm, E, (3,))),
            weight=jnp.asarray(pad(w, E, ())),
            edge_valid=jnp.asarray(np.arange(E) < ne),
        )
        res = optimize_pose_graph_jit(g, self.pg_cfg)
        Rn = np.asarray(res.R[:n])
        tn = np.asarray(res.t[:n])
        self.corrected = [(Rn[k], tn[k]) for k in range(n)]
        centers = np.stack([-Rn[k].T @ tn[k] for k in range(n)])
        return centers
