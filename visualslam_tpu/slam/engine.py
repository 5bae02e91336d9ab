"""Device-resident SLAM engine: a whole frame batch as ONE device program.

Round-3 measurements (benchmarks/stage_breakdown.json) put ~117 ms of host
time on every keyframe: a ~1 MB descriptor readback (58 ms), a separate
loop-closure dispatch+readback (40 ms), a BA flush (14 ms), a device-cache
re-upload (5 ms) — plus one extra dispatch/readback round per keyframe
because the batched track scan had to re-enter after every promotion. At
~14 keyframes per 96 frames that keyframe path alone was the gap between
~21 fps and the 30 fps north star (reference promise: the stages "tied
together", /root/reference/README.md:24).

This module removes the host from the keyframe path entirely. Keyframe
promotion happens INSIDE the scanned batch program:

  per frame   track_step_lite (local-map match + PnP + velocity model)
  on promote  2D-2D match vs the last keyframe + triangulation gates
              (slam/track_step.keyframe_step), then — still on device —
              * local-map maintenance: descriptor refresh for tracked
                landmarks, slot allocation for new ones (free slots first,
                then oldest-seen; the host upload of X/valid at the next
                batch boundary remains the authority on window membership)
              * keyframe-reference swap (the 2D-2D source becomes this
                frame; descriptors NEVER travel to the host)
              * loop database append: global descriptor, landmark-first
                top-Ks subsample, landmark-position snapshot
              * loop retrieval (cosine matvec over the device database) +
                geometric verification (descriptor match + motion-only PnP
                per candidate) + Sim(3) relative-scale estimate

so a B-frame batch costs ONE dispatch + ONE packed readback of
[B, 24] stats + one ~66 KB record per promotion, regardless of how many
keyframes it produced. The host's remaining jobs per batch: decode the
packed buffer into map bookkeeping (numpy), dispatch the (async) window BA,
and — only when a verified loop edge came back — run the pose graph and
upload the corrections.

Capacities (all static per compiled program): K feature slots, Kl local-map
slots, M match slots, Ks loop-subsample slots, DBCAP loop-database entries,
P = max promotions per batch (ceil(B / max(1, keyframe_min_gap)), which the
gating makes unreachable to overflow).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from visualslam_tpu.backend.pnp import refine_pose
from visualslam_tpu.geometry.camera import normalized
from visualslam_tpu.models.matching import match_features
from visualslam_tpu.models.types import Features, Keypoints
from visualslam_tpu.slam.track_step import (
    KeyframeRef,
    LocalMap,
    TrackState,
    index_features,
    keyframe_step,
    track_step_lite,
)
from visualslam_tpu.utils.config import SlamConfig

NC = 3          # loop retrieval candidates verified per promotion
LOOP_REC = 18   # per-candidate verify record:
#                 [cand, sim, usable, inl, R(9), t(3), scale, nboth]
HDR = 8         # promotion record header floats


class EnginePersist(NamedTuple):
    """Device state that lives ACROSS batches and never visits the host
    (except at checkpoint time). Shapes: K=feature capacity, Df=float
    descriptor dim, Kl=local-map slots, Ks=loop subsample, N=DBCAP."""

    kf_desc: jnp.ndarray     # [K, D] last keyframe descriptors (native dtype)
    kf_yx: jnp.ndarray       # [K, 2]
    kf_valid: jnp.ndarray    # [K] bool
    kf_has_lm: jnp.ndarray   # [K] bool
    lm_desc: jnp.ndarray     # [Kl, D] local-map descriptors
    lm_last: jnp.ndarray     # [Kl] int32 frame counter of last association
    db_g: jnp.ndarray        # [N, Df] global descriptors (L2-normalized)
    db_desc: jnp.ndarray     # [N, Ks, Df] float local descriptors
    db_yx: jnp.ndarray       # [N, Ks, 2]
    db_lmw: jnp.ndarray      # [N, Ks, 3] landmark snapshot per sub keypoint
    db_haslm: jnp.ndarray    # [N, Ks] bool
    db_R: jnp.ndarray        # [N, 3, 3] entry poses (pose-graph corrected)
    db_t: jnp.ndarray        # [N, 3]


class EngineDyn(NamedTuple):
    """Host-supplied per-batch inputs (tiny uploads; the host is the
    authority on poses after BA / loop corrections and on local-map window
    membership)."""

    R: jnp.ndarray           # [3, 3] pose state entering the batch
    t: jnp.ndarray           # [3]
    vel: jnp.ndarray         # [6]
    kf_R: jnp.ndarray        # [3, 3] last keyframe pose (post-BA)
    kf_t: jnp.ndarray        # [3]
    lm_X: jnp.ndarray        # [Kl, 3] local-map positions (post-BA)
    lm_valid: jnp.ndarray    # [Kl] bool window membership
    since_kf: jnp.ndarray    # [] int32 frames since last keyframe
    frame_base: jnp.ndarray  # [] int32 global index of batch frame 0
    db_n: jnp.ndarray        # [] int32 loop-database entry count
    start: jnp.ndarray       # [] int32 first active frame in the batch


class _Carry(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    vel: jnp.ndarray
    since_kf: jnp.ndarray
    kf_desc: jnp.ndarray
    kf_yx: jnp.ndarray
    kf_valid: jnp.ndarray
    kf_has_lm: jnp.ndarray
    kf_R: jnp.ndarray
    kf_t: jnp.ndarray
    lm_desc: jnp.ndarray
    lm_X: jnp.ndarray
    lm_valid: jnp.ndarray
    lm_last: jnp.ndarray
    db_n: jnp.ndarray
    db_g: jnp.ndarray
    db_desc: jnp.ndarray
    db_yx: jnp.ndarray
    db_lmw: jnp.ndarray
    db_haslm: jnp.ndarray
    db_R: jnp.ndarray
    db_t: jnp.ndarray
    prom_n: jnp.ndarray
    prom_buf: jnp.ndarray


def float_desc(desc: jnp.ndarray) -> jnp.ndarray:
    """Descriptors as floats: bit-packed ORB words unpack to {0,1} in the
    same bit order as np.unpackbits(view(uint8), bitorder='little') so L2
    == 2x Hamming and the loop database matches the host convention
    (slam/loop_closure._prep_features)."""
    if desc.dtype == jnp.uint32:
        bits = (desc[:, :, None] >> jnp.arange(32, dtype=jnp.uint32)) & 1
        return bits.reshape(desc.shape[0], -1).astype(jnp.float32)
    return desc.astype(jnp.float32)


def float_desc_dim(desc_dim: int, dtype) -> int:
    return desc_dim * 32 if np.dtype(dtype) == np.uint32 else desc_dim


def prom_record_size(M: int) -> int:
    return HDR + M * 7 + M * 9 + NC * LOOP_REC


def _sub_match_cfg(cfg: SlamConfig):
    return cfg.match.replace(max_matches=cfg.loop.sub_keypoints,
                             metric="l2", impl="xla")


def _verify_candidate(a_desc, a_yx, a_haslm, a_lmw,
                      b_desc, b_yx, b_haslm, b_lmw, b_R, b_t,
                      intr, sub_cfg, estimate_scale: bool):
    """Geometric loop verification, fully traced: descriptor match +
    motion-only PnP of the candidate camera against the current keyframe's
    landmark snapshot (metric scale preserved — sidesteps the essential
    matrix's scale ambiguity), plus the Sim(3) relative-scale estimate
    (median pairwise-distance ratio over landmark pairs with 3D in BOTH
    keyframes, mirroring slam/loop_closure._edge_from_packed)."""
    ks = a_desc.shape[0]
    ones = jnp.ones(ks, bool)
    fa = Features(Keypoints.empty(ks)._replace(yx=a_yx, valid=ones), a_desc)
    fb = Features(Keypoints.empty(ks)._replace(yx=b_yx, valid=ones), b_desc)
    m = match_features(fa, fb, sub_cfg)
    usable = m.valid & a_haslm[m.idx_a]
    X = a_lmw[m.idx_a]
    x_b = normalized(b_yx[m.idx_b][:, ::-1], intr)
    pr = refine_pose(b_R, b_t, X, x_b, usable)

    scale = jnp.float32(1.0)
    nboth = jnp.int32(0)
    if estimate_scale:
        both = pr.inliers & usable & b_haslm[m.idx_b]
        NS = 32
        # up to NS matched pairs with 3D on both sides (stable partition)
        sel = jnp.argsort(~both)[:NS]
        ok = both[sel]
        Xa = a_lmw[m.idx_a[sel]]
        Xb = b_lmw[m.idx_b[sel]]
        da = jnp.linalg.norm(Xa[:, None] - Xa[None, :], axis=-1)
        db = jnp.linalg.norm(Xb[:, None] - Xb[None, :], axis=-1)
        iu = jnp.triu(jnp.ones((NS, NS), bool), 1)
        pair_ok = ok[:, None] & ok[None, :] & iu & (da > 1e-6) & (db > 1e-6)
        ratio = db / jnp.maximum(da, 1e-6)
        vals = jnp.sort(jnp.where(pair_ok, ratio, jnp.inf).reshape(-1))
        n_ok = jnp.sum(pair_ok.astype(jnp.int32))
        med = vals[jnp.maximum(n_ok - 1, 0) // 2]          # lower median
        nboth = jnp.sum(ok.astype(jnp.int32))
        scale = jnp.where(n_ok >= 10,
                          jnp.clip(med, 0.2, 5.0), jnp.float32(1.0))

    f32 = jnp.float32
    return jnp.concatenate([
        jnp.stack([jnp.sum(usable.astype(f32)),
                   pr.num_inliers.astype(f32)]),
        pr.R.reshape(-1), pr.t,
        jnp.stack([scale, nboth.astype(f32)]),
    ])                                                     # [15]


def _promote(c: _Carry, feats: Features, lite, i, fctr, intr,
             cfg: SlamConfig, max_depth: float, P: int):
    """The in-scan keyframe promotion: everything the host used to fetch a
    megabyte for, as pure device updates + one compact record."""
    K = feats.capacity
    Kl = c.lm_desc.shape[0]
    M = cfg.match.max_matches
    Ks = cfg.loop.sub_keypoints
    CAP = c.db_g.shape[0]

    kfref = KeyframeRef(desc=c.kf_desc, yx=c.kf_yx, kp_valid=c.kf_valid,
                        kp_has_lm=c.kf_has_lm, R=c.kf_R, t=c.kf_t)
    full = keyframe_step(kfref, feats, lite, intr, cfg, max_depth)
    m_idx_a = full.assoc_i[:, 3]
    m_idx_b = full.assoc_i[:, 4]
    tri_good = (full.assoc_i[:, 5] & 2) > 0
    Xw = full.assoc_f[:, 6:9]

    seen = lite.ml_gated & lite.ml_inlier                  # [M]

    # ---- local-map maintenance -------------------------------------
    # new-landmark slot allocation: invalid slots first, then oldest-seen
    key = jnp.where(c.lm_valid, c.lm_last.astype(jnp.float32), -jnp.inf)
    order = jnp.argsort(key)                               # [Kl]
    rank = jnp.cumsum(tri_good.astype(jnp.int32)) - 1
    can_alloc = tri_good & (rank < Kl)
    slot = jnp.where(can_alloc, order[jnp.clip(rank, 0, Kl - 1)], Kl)

    idx_seen_a = jnp.where(seen, lite.ml_idx_a, Kl)
    lm_desc = c.lm_desc.at[idx_seen_a].set(
        feats.descriptors[lite.ml_idx_b], mode="drop")
    lm_desc = lm_desc.at[slot].set(feats.descriptors[m_idx_b], mode="drop")
    lm_X = c.lm_X.at[slot].set(Xw, mode="drop")
    lm_valid = c.lm_valid.at[slot].set(True, mode="drop")
    lm_last = c.lm_last.at[slot].set(fctr, mode="drop")

    # ---- keyframe-reference swap ------------------------------------
    has_lm = jnp.zeros(K, bool)
    has_lm = has_lm.at[jnp.where(seen, lite.ml_idx_b, K)].set(
        True, mode="drop")
    has_lm = has_lm.at[jnp.where(can_alloc, m_idx_b, K)].set(
        True, mode="drop")

    # landmark position per current keypoint (the loop entry's 3D snapshot)
    lmw_kp = jnp.zeros((K, 3), jnp.float32)
    lmw_kp = lmw_kp.at[jnp.where(seen, lite.ml_idx_b, K)].set(
        c.lm_X[lite.ml_idx_a], mode="drop")
    lmw_kp = lmw_kp.at[jnp.where(can_alloc, m_idx_b, K)].set(
        Xw, mode="drop")

    # ---- loop database entry ----------------------------------------
    descF = float_desc(feats.descriptors)
    kp = feats.keypoints
    w = jnp.where(kp.valid, jnp.maximum(kp.response, 1e-6), 0.0)
    g = jnp.sum(descF * w[:, None], axis=0)
    g = g / jnp.maximum(jnp.linalg.norm(g), 1e-9)
    score = jnp.where(kp.valid, kp.response, -jnp.inf) + has_lm * 1e6
    _, sub = jax.lax.top_k(score, Ks)
    sub_desc = descF[sub]
    sub_yx = kp.yx[sub]
    sub_haslm = has_lm[sub] & kp.valid[sub]
    sub_lmw = lmw_kp[sub]

    # ---- retrieval + verification (against the PRE-append database) --
    sims = c.db_g @ g                                      # [CAP]
    elig = jnp.arange(CAP) < (c.db_n - cfg.loop.exclude_recent)
    simsm = jnp.where(elig, sims, -2.0)
    top_sims, cand = jax.lax.top_k(simsm, NC)
    sub_cfg = _sub_match_cfg(cfg)
    ver = jax.vmap(
        lambda ci: _verify_candidate(
            sub_desc, sub_yx, sub_haslm, sub_lmw,
            c.db_desc[ci], c.db_yx[ci], c.db_haslm[ci], c.db_lmw[ci],
            c.db_R[ci], c.db_t[ci], intr, sub_cfg, cfg.loop.sim3))(cand)
    loop_pack = jnp.concatenate([
        cand.astype(jnp.float32)[:, None], top_sims[:, None], ver,
    ], axis=1)                                             # [NC, LOOP_REC]

    # ---- database append --------------------------------------------
    wr = jnp.where(c.db_n < CAP, c.db_n, CAP)
    db_g = c.db_g.at[wr].set(g, mode="drop")
    db_desc = c.db_desc.at[wr].set(sub_desc, mode="drop")
    db_yx = c.db_yx.at[wr].set(sub_yx, mode="drop")
    db_lmw = c.db_lmw.at[wr].set(sub_lmw, mode="drop")
    db_haslm = c.db_haslm.at[wr].set(sub_haslm, mode="drop")
    db_R = c.db_R.at[wr].set(lite.R, mode="drop")
    db_t = c.db_t.at[wr].set(lite.t, mode="drop")

    # ---- promotion record -------------------------------------------
    hdr = jnp.zeros(HDR, jnp.float32)
    hdr = hdr.at[0].set(i.astype(jnp.float32))
    hdr = hdr.at[1].set(full.stats[0])                     # 2D-2D count
    ai = jnp.concatenate([
        full.assoc_i.astype(jnp.float32),
        slot.astype(jnp.float32)[:, None],
    ], axis=1)                                             # [M, 7]
    rec = jnp.concatenate([
        hdr, ai.reshape(-1), full.assoc_f.reshape(-1), loop_pack.reshape(-1),
    ])
    prom_buf = c.prom_buf.at[c.prom_n].set(rec, mode="drop")

    return c._replace(
        kf_desc=feats.descriptors, kf_yx=kp.yx, kf_valid=kp.valid,
        kf_has_lm=has_lm, kf_R=lite.R, kf_t=lite.t,
        lm_desc=lm_desc, lm_X=lm_X, lm_valid=lm_valid, lm_last=lm_last,
        db_n=jnp.minimum(c.db_n + 1, CAP),
        db_g=db_g, db_desc=db_desc, db_yx=db_yx, db_lmw=db_lmw,
        db_haslm=db_haslm, db_R=db_R, db_t=db_t,
        prom_n=c.prom_n + 1, prom_buf=prom_buf)


def run_engine_batch(persist: EnginePersist, dyn: EngineDyn,
                     feats_b: Features, intr: jnp.ndarray, cfg: SlamConfig,
                     ok_min: int, max_depth: float):
    """The whole-batch program. Returns (packed f32 buffer, new persist).

    packed layout: [B*24 stats][prom_n][db_n][P * prom_record_size(M)].
    stats row: the track_step_lite 22-vector + [22] promoted + [23] spare.
    """
    B = feats_b.keypoints.yx.shape[0]
    Kl = persist.lm_desc.shape[0]
    M = cfg.match.max_matches
    P = max(1, -(-B // max(1, cfg.keyframe_min_gap)))
    PROD = prom_record_size(M)

    carry0 = _Carry(
        R=dyn.R, t=dyn.t, vel=dyn.vel, since_kf=dyn.since_kf,
        kf_desc=persist.kf_desc, kf_yx=persist.kf_yx,
        kf_valid=persist.kf_valid, kf_has_lm=persist.kf_has_lm,
        kf_R=dyn.kf_R, kf_t=dyn.kf_t,
        lm_desc=persist.lm_desc, lm_X=dyn.lm_X, lm_valid=dyn.lm_valid,
        lm_last=persist.lm_last,
        db_n=dyn.db_n,
        db_g=persist.db_g, db_desc=persist.db_desc, db_yx=persist.db_yx,
        db_lmw=persist.db_lmw, db_haslm=persist.db_haslm,
        db_R=persist.db_R, db_t=persist.db_t,
        prom_n=jnp.int32(0), prom_buf=jnp.zeros((P, PROD), jnp.float32))

    def step(c: _Carry, i):
        feats = index_features(feats_b, i)
        active = i >= dyn.start
        lmap = LocalMap(desc=c.lm_desc, X=c.lm_X, valid=c.lm_valid)
        lite = track_step_lite(lmap, feats, TrackState(c.R, c.t, c.vel),
                               intr, cfg, ok_min)
        w = lambda a, b: jnp.where(active, a, b)            # noqa: E731
        lite = lite._replace(
            R=w(lite.R, c.R), t=w(lite.t, c.t), vel=w(lite.vel, c.vel),
            stats=jnp.where(active, lite.stats, 0.0),
            ml_gated=lite.ml_gated & active,
            ml_inlier=lite.ml_inlier & active,
            ok=lite.ok & active)

        fctr = dyn.frame_base + i
        seen = lite.ml_gated & lite.ml_inlier
        lm_last = c.lm_last.at[jnp.where(seen, lite.ml_idx_a, Kl)].set(
            fctr, mode="drop")
        since = jnp.where(active, c.since_kf + 1, c.since_kf)
        inl = lite.stats[1]
        need_kf = (active & lite.ok & (since >= cfg.keyframe_min_gap)
                   & ((inl < cfg.keyframe_min_inliers)
                      | (since >= cfg.keyframe_max_gap))
                   & (c.prom_n < P))

        c = c._replace(R=lite.R, t=lite.t, vel=lite.vel, lm_last=lm_last,
                       since_kf=jnp.where(need_kf, 0, since))
        c = jax.lax.cond(
            need_kf,
            lambda cc: _promote(cc, feats, lite, i, fctr, intr, cfg,
                                max_depth, P),
            lambda cc: cc,
            c)
        stats = jnp.concatenate([
            lite.stats,
            jnp.stack([need_kf.astype(jnp.float32), jnp.float32(0.0)]),
        ])
        return c, stats

    carry, stats = jax.lax.scan(step, carry0,
                                jnp.arange(B, dtype=jnp.int32))
    packed = jnp.concatenate([
        stats.reshape(-1),
        carry.prom_n.astype(jnp.float32)[None],
        carry.db_n.astype(jnp.float32)[None],
        carry.prom_buf.reshape(-1),
    ])
    new_persist = EnginePersist(
        kf_desc=carry.kf_desc, kf_yx=carry.kf_yx, kf_valid=carry.kf_valid,
        kf_has_lm=carry.kf_has_lm, lm_desc=carry.lm_desc,
        lm_last=carry.lm_last, db_g=carry.db_g, db_desc=carry.db_desc,
        db_yx=carry.db_yx, db_lmw=carry.db_lmw, db_haslm=carry.db_haslm,
        db_R=carry.db_R, db_t=carry.db_t)
    return packed, new_persist


def engine_relocalize(persist: EnginePersist, db_n, feats: Features,
                      intr, cfg: SlamConfig):
    """Database relocalization for an unlocalized frame (recovery path):
    retrieval WITHOUT temporal exclusion + verification of the top NC
    candidates, one packed readback. Layout: [NC, 2 + 15] rows of
    [cand, sim, verify-record]."""
    CAP = persist.db_g.shape[0]
    Ks = cfg.loop.sub_keypoints
    descF = float_desc(feats.descriptors)
    kp = feats.keypoints
    w = jnp.where(kp.valid, jnp.maximum(kp.response, 1e-6), 0.0)
    g = jnp.sum(descF * w[:, None], axis=0)
    g = g / jnp.maximum(jnp.linalg.norm(g), 1e-9)
    score = jnp.where(kp.valid, kp.response, -jnp.inf)
    _, sub = jax.lax.top_k(score, Ks)
    q_desc = descF[sub]
    q_yx = kp.yx[sub]

    sims = persist.db_g @ g
    simsm = jnp.where(jnp.arange(CAP) < db_n, sims, -2.0)
    top_sims, cand = jax.lax.top_k(simsm, NC)
    sub_cfg = _sub_match_cfg(cfg)
    # entry side carries the landmarks; the query is the camera being
    # located, initialized at the entry's (corrected) pose
    ver = jax.vmap(
        lambda ci: _verify_candidate(
            persist.db_desc[ci], persist.db_yx[ci], persist.db_haslm[ci],
            persist.db_lmw[ci],
            q_desc, q_yx, jnp.zeros(Ks, bool), jnp.zeros((Ks, 3)),
            persist.db_R[ci], persist.db_t[ci], intr, sub_cfg, False))(cand)
    return jnp.concatenate([
        cand.astype(jnp.float32)[:, None], top_sims[:, None], ver], axis=1)


def apply_db_correction(persist: EnginePersist, Rg, tg, sg, Rc, tc, n):
    """Propagate pose-graph corrections into the device database: entry
    k < n adopts corrected pose (Rc[k], tc[k]) and its landmark snapshot
    moves by its own world-side Sim(3) G_k: X' = sg (X @ Rg^T) + tg
    (mirrors LoopCloser.optimize's propagate step)."""
    CAP = persist.db_g.shape[0]
    mask = jnp.arange(CAP) < n
    lmw = (jnp.einsum("nkd,ned->nke", persist.db_lmw, Rg)
           * sg[:, None, None] + tg[:, None, :])
    m3 = mask[:, None, None]
    return persist._replace(
        db_lmw=jnp.where(m3, lmw, persist.db_lmw),
        db_R=jnp.where(m3, Rc, persist.db_R),
        db_t=jnp.where(mask[:, None], tc, persist.db_t))


# ---------------------------------------------------------------------
# host-side codec + state builders
# ---------------------------------------------------------------------


class PromRecord(NamedTuple):
    """Host-decoded promotion record."""

    frame: int               # index within the batch
    n2d: int                 # 2D-2D match count vs the previous keyframe
    lm_slot: np.ndarray      # [M] local-map slot of tracked association
    lm_kp: np.ndarray        # [M] current keypoint index
    lm_obs: np.ndarray       # [M] bool gated & PnP-inlier (an observation)
    lm_x: np.ndarray         # [M, 2] normalized observation
    m_idx_a: np.ndarray      # [M] previous-keyframe keypoint
    m_idx_b: np.ndarray      # [M] current keypoint
    tri_good: np.ndarray     # [M] bool new landmark accepted
    tri_slot: np.ndarray     # [M] engine local-map slot assigned (Kl = none)
    m_x1: np.ndarray         # [M, 2]
    m_x2: np.ndarray         # [M, 2]
    tri_X: np.ndarray        # [M, 3]
    loop: np.ndarray         # [NC, LOOP_REC] retrieval+verify results


def decode_packed(packed: np.ndarray, B: int, M: int, P: int):
    """Inverse of run_engine_batch's packing. Returns
    (stats [B, 24], [PromRecord...], db_n)."""
    a = np.asarray(packed)
    o = B * 24
    stats = a[:o].reshape(B, 24)
    prom_n = int(a[o])
    db_n = int(a[o + 1])
    o += 2
    PROD = prom_record_size(M)
    recs = []
    for p in range(prom_n):
        r = a[o + p * PROD: o + (p + 1) * PROD]
        hdr = r[:HDR]
        ai = r[HDR: HDR + M * 7].reshape(M, 7).astype(np.int64)
        af = r[HDR + M * 7: HDR + M * 16].reshape(M, 9)
        loop = r[HDR + M * 16:].reshape(NC, LOOP_REC)
        recs.append(PromRecord(
            frame=int(hdr[0]), n2d=int(hdr[1]),
            lm_slot=ai[:, 0], lm_kp=ai[:, 1],
            lm_obs=(ai[:, 2] & 1).astype(bool) & (ai[:, 2] & 2).astype(bool),
            lm_x=af[:, 0:2],
            m_idx_a=ai[:, 3], m_idx_b=ai[:, 4],
            tri_good=(ai[:, 5] & 2).astype(bool), tri_slot=ai[:, 6],
            m_x1=af[:, 2:4], m_x2=af[:, 4:6], tri_X=af[:, 6:9],
            loop=loop))
    return stats, recs, db_n


def decode_loop_row(row: np.ndarray):
    """One loop verify row -> (cand, sim, n_usable, n_inl, R, t, scale,
    n_both)."""
    return (int(row[0]), float(row[1]), int(row[2]), int(row[3]),
            row[4:13].reshape(3, 3).astype(np.float32),
            row[13:16].astype(np.float32), float(row[16]), int(row[17]))


def build_persist_from_host(slam_map, cfg: SlamConfig,
                            db_entries=None, old_persist=None,
                            db_capacity: int | None = None):
    """Assemble an EnginePersist from host state — used on engine entry
    (after bootstrap/two-view init, recovery, or checkpoint resume).

    Local map + keyframe ref come from the host map (whose keyframes hold
    host descriptor copies at this point — init and recovery paths fetch
    them). The loop database comes from `old_persist` when one exists
    (device entries survive recovery: history stays usable for
    relocalization) else from host LoopCloser-style `db_entries`.

    Returns (persist, lmap_ids [Kl] global landmark slot per engine slot,
    db_n)."""
    from visualslam_tpu.slam.track_step import build_local_map

    Kl = cfg.local_map_size
    Ks = cfg.loop.sub_keypoints
    CAP = db_capacity or cfg.loop.db_capacity

    kf = slam_map.last_keyframe_slot()
    desc = slam_map.kf_desc[kf]
    if desc is None:
        raise RuntimeError(
            "engine entry needs host descriptors for the last keyframe "
            "(bootstrap/init/recovery paths fetch them)")
    K = desc.shape[0]
    Df = float_desc_dim(desc.shape[1], desc.dtype)
    lmap, ids = build_local_map(slam_map, Kl, desc.shape[1], desc.dtype)

    if old_persist is not None:
        db = (old_persist.db_g, old_persist.db_desc, old_persist.db_yx,
              old_persist.db_lmw, old_persist.db_haslm, old_persist.db_R,
              old_persist.db_t)
        db_n = None      # caller keeps its own count
    else:
        db_g = np.zeros((CAP, Df), np.float32)
        db_desc = np.zeros((CAP, Ks, Df), np.float32)
        db_yx = np.zeros((CAP, Ks, 2), np.float32)
        db_lmw = np.zeros((CAP, Ks, 3), np.float32)
        db_haslm = np.zeros((CAP, Ks), bool)
        db_R = np.tile(np.eye(3, dtype=np.float32), (CAP, 1, 1))
        db_t = np.zeros((CAP, 3), np.float32)
        n = 0
        for e in (db_entries or []):
            if n >= CAP:
                break
            if e.desc is None:
                # device-resident entry whose ring data is gone (no
                # old_persist): keep the index slot for alignment; a zero
                # global descriptor can never pass the cosine gate
                n += 1
                continue
            db_g[n] = e.global_desc
            k = min(Ks, e.desc.shape[0])
            db_desc[n, :k] = e.desc[:k]
            db_yx[n, :k] = e.yx[:k]
            db_lmw[n, :k] = e.lm_world[:k]
            db_haslm[n, :k] = e.has_lm[:k]
            db_R[n] = e.R
            db_t[n] = e.t
            n += 1
        db = tuple(jnp.asarray(x) for x in
                   (db_g, db_desc, db_yx, db_lmw, db_haslm, db_R, db_t))
        db_n = n

    kp_lm = slam_map.kf_kp_lm[kf]
    persist = EnginePersist(
        kf_desc=jnp.asarray(desc),
        kf_yx=jnp.asarray(slam_map.kf_yx[kf], jnp.float32),
        kf_valid=jnp.asarray(slam_map.kf_kp_valid[kf]),
        kf_has_lm=jnp.asarray(kp_lm[:K] >= 0),
        lm_desc=lmap.desc,
        lm_last=jnp.zeros(Kl, jnp.int32),
        db_g=db[0], db_desc=db[1], db_yx=db[2], db_lmw=db[3],
        db_haslm=db[4], db_R=db[5], db_t=db[6])
    return persist, ids, db_n


def db_append_host(persist: EnginePersist, n, g, desc, yx, lmw, haslm,
                   R, t):
    """Append one host-assembled entry at ring index n (keeps the device
    ring aligned with LoopCloser.entries when a host-path keyframe — e.g. a
    post-recovery two-view init — lands while a device database exists)."""
    return persist._replace(
        db_g=persist.db_g.at[n].set(g, mode="drop"),
        db_desc=persist.db_desc.at[n].set(desc, mode="drop"),
        db_yx=persist.db_yx.at[n].set(yx, mode="drop"),
        db_lmw=persist.db_lmw.at[n].set(lmw, mode="drop"),
        db_haslm=persist.db_haslm.at[n].set(haslm, mode="drop"),
        db_R=persist.db_R.at[n].set(R, mode="drop"),
        db_t=persist.db_t.at[n].set(t, mode="drop"))


@functools.lru_cache(maxsize=32)
def engine_programs(cfg: SlamConfig, ok_min: int, max_depth: float):
    """Jitted engine entry points, shared across Tracker instances."""
    return {
        "batch": jax.jit(
            lambda persist, dyn, fb, intr: run_engine_batch(
                persist, dyn, fb, intr, cfg, ok_min, max_depth)),
        "relocalize": jax.jit(
            lambda persist, db_n, feats, intr: engine_relocalize(
                persist, db_n, feats, intr, cfg)),
        "db_correct": jax.jit(apply_db_correction),
        "db_append": jax.jit(db_append_host),
    }
