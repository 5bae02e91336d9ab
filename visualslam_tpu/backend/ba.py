"""Sliding-window bundle adjustment: damped Gauss-Newton with landmark
(Schur) elimination.

Absent in the reference (BASELINE.json configs[3]; SURVEY.md §2.3) — designed
TPU-first:

  - observations are a fixed-capacity SoA (cam_idx, lm_idx, uv, valid), the
    sparse structure is handled with segment_sum scatter-adds, never
    data-dependent loops;
  - the camera-landmark coupling W is materialized DENSE [C,6,L,3]
    (C<=10, L<=8k -> ~6 MB) so the Schur product S = U - W V^-1 W^T is one
    big MXU matmul instead of sparse gather-scatter;
  - 3x3 landmark blocks invert in closed form (batched adjugate);
  - the reduced 6C x 6C camera system solves dense (C is small);
  - Levenberg-Marquardt runs a FIXED number of iterations with masked
    accept/reject (no early exit), carrying (poses, points, lambda) through
    lax.fori_loop-style Python unroll (iters is static config).

Conventions: world-to-camera poses (x_cam = R X + t), residuals on the
normalized image plane, left-multiplicative se(3) perturbation
exp(xi) . T with xi = [omega, v]. Jacobians are analytic:
  d x_cam / d xi = [ -[x_cam]_x | I ],   d x_cam / d X = R
  d pi / d p = [[1/z, 0, -x/z^2], [0, 1/z, -y/z^2]],  pi(p) = p_xy / p_z.

Distribution (parallel/dist_ba.py): shard landmarks+observations, psum the
reduced system, solve replicated, update landmarks shard-local.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from visualslam_tpu.geometry import se3
from visualslam_tpu.utils.config import BAConfig


class BAProblem(NamedTuple):
    """Fixed-capacity BA problem. C cameras, L landmarks, O observations."""

    R: jnp.ndarray          # [C, 3, 3] world-to-camera rotations
    t: jnp.ndarray          # [C, 3]
    X: jnp.ndarray          # [L, 3] world points
    cam_idx: jnp.ndarray    # [O] int32
    lm_idx: jnp.ndarray     # [O] int32
    uv: jnp.ndarray         # [O, 2] normalized-plane measurements
    obs_valid: jnp.ndarray  # [O] bool
    cam_valid: jnp.ndarray  # [C] bool
    lm_valid: jnp.ndarray   # [L] bool


class BAResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    X: jnp.ndarray
    cost: jnp.ndarray       # final robust cost
    initial_cost: jnp.ndarray
    lm_lambda: jnp.ndarray


def _residuals_jacobians(p: BAProblem, R, t, X, huber_delta: float):
    """Per-observation residuals + Jacobians with sqrt-Huber IRLS weights.

    Returns (r [O,2], Jc [O,2,6], Jl [O,2,3], w [O]) already weight-scaled.
    """
    Rc = R[p.cam_idx]                                   # [O, 3, 3]
    tc = t[p.cam_idx]
    Xl = X[p.lm_idx]
    pc = jnp.einsum("oij,oj->oi", Rc, Xl) + tc          # [O, 3] camera frame
    z = pc[:, 2]
    behind = z <= 1e-6
    zs = jnp.where(behind, 1.0, z)
    proj = pc[:, :2] / zs[:, None]
    r = proj - p.uv                                     # [O, 2]

    inv_z = 1.0 / zs
    zeros = jnp.zeros_like(inv_z)
    dpi = jnp.stack([
        jnp.stack([inv_z, zeros, -pc[:, 0] * inv_z * inv_z], -1),
        jnp.stack([zeros, inv_z, -pc[:, 1] * inv_z * inv_z], -1),
    ], -2)                                              # [O, 2, 3]

    dp_dxi = jnp.concatenate([-se3.hat(pc), jnp.broadcast_to(
        jnp.eye(3, dtype=r.dtype), pc.shape[:-1] + (3, 3))], axis=-1)  # [O,3,6]
    Jc = dpi @ dp_dxi                                   # [O, 2, 6]
    Jl = dpi @ Rc                                       # [O, 2, 3]

    valid = p.obs_valid & ~behind
    rn = jnp.linalg.norm(r, axis=-1)
    huber = jnp.sqrt(jnp.minimum(1.0, huber_delta / jnp.maximum(rn, 1e-12)))
    w = jnp.where(valid, huber, 0.0)                    # [O] sqrt-weights
    return r * w[:, None], Jc * w[:, None, None], Jl * w[:, None, None], w


def robust_cost(p: BAProblem, R, t, X, huber_delta: float) -> jnp.ndarray:
    """Huber cost of the current state (for LM accept/reject)."""
    Rc = R[p.cam_idx]
    tc = t[p.cam_idx]
    pc = jnp.einsum("oij,oj->oi", Rc, X[p.lm_idx]) + tc
    z = pc[:, 2]
    behind = z <= 1e-6
    proj = pc[:, :2] / jnp.where(behind, 1.0, z)[:, None]
    r2 = jnp.sum((proj - p.uv) ** 2, axis=-1)
    rn = jnp.sqrt(r2)
    d = huber_delta
    cost = jnp.where(rn <= d, 0.5 * r2, d * (rn - 0.5 * d))
    # out-of-front observations get a fixed penalty (keeps cost comparable)
    cost = jnp.where(behind, d * d, cost)
    return jnp.sum(jnp.where(p.obs_valid, cost, 0.0))


def _inv3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack([
        jnp.stack([A, B, C], -1),
        jnp.stack([D, E, F], -1),
        jnp.stack([G, H, I], -1),
    ], -2)
    return adj / det[..., None, None]


def normal_equations(p: BAProblem, R, t, X, cfg: BAConfig):
    """Assemble (U [C,6,6], V [L,3,3], bc [C,6], bl [L,3], Wd [C,L,6,3]).

    The camera-landmark coupling Wd is built by a one-hot scatter so the
    whole assembly is segment-sums + matmuls. Under shard_map this runs on
    the LOCAL observation/landmark shard and the caller psums the reduced
    camera system (SURVEY.md §5: Schur assembly with psum over landmark
    contributions)."""
    C = R.shape[0]
    L = X.shape[0]
    r, Jc, Jl, _ = _residuals_jacobians(p, R, t, X, cfg.huber_delta)

    JcT_Jc = jnp.einsum("oai,oaj->oij", Jc, Jc)          # [O, 6, 6]
    JlT_Jl = jnp.einsum("oai,oaj->oij", Jl, Jl)          # [O, 3, 3]
    JcT_r = jnp.einsum("oai,oa->oi", Jc, r)              # [O, 6]
    JlT_r = jnp.einsum("oai,oa->oi", Jl, r)              # [O, 3]
    U = jax.ops.segment_sum(JcT_Jc, p.cam_idx, C)        # [C, 6, 6]
    V = jax.ops.segment_sum(JlT_Jl, p.lm_idx, L)         # [L, 3, 3]
    bc = -jax.ops.segment_sum(JcT_r, p.cam_idx, C)       # [C, 6]
    bl = -jax.ops.segment_sum(JlT_r, p.lm_idx, L)        # [L, 3]

    # camera-landmark coupling: scatter-add over the fused (cam, lm) pair
    # index — O(O) memory/traffic. (Round 1 built this from [O, C] and
    # [O, L] one-hots; the lm one-hot alone is 512 MB at O=16k, L=8k.)
    JcT_Jl = jnp.einsum("oai,oaj->oij", Jc, Jl)          # [O, 6, 3]
    pair = p.cam_idx * L + p.lm_idx                      # [O]
    Wd = jax.ops.segment_sum(JcT_Jl, pair, C * L).reshape(C, L, 6, 3)
    return U, V, bc, bl, Wd


def schur_camera_system(U, V, bc, bl, Wd, lam):
    """Local (partial) reduced camera system before cross-shard reduction.

    Returns (S_partial [C,6,C,6], b_partial [C,6], V_inv [L,3,3]). Damping
    of U is NOT applied here (the caller adds lam*I once, after any psum)."""
    C = U.shape[0]
    eye3 = jnp.eye(3, dtype=U.dtype)
    V_inv = _inv3x3(V + lam * eye3)                      # [L, 3, 3]
    Y = jnp.einsum("clij,ljk->clik", Wd, V_inv)          # [C, L, 6, 3]
    S = -jnp.einsum("clik,dljk->cidj", Y, Wd)            # [C, 6, C, 6]
    S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(U)
    b = bc - jnp.einsum("clik,lk->ci", Y, bl)            # [C, 6]
    return S, b, V_inv


def solve_cameras(S, b, cam_valid, lam, cfg: BAConfig):
    """Damp, gauge-fix, and solve the reduced 6C x 6C camera system.

    solver="schur_dense": direct dense solve (best for small windows);
    solver="schur_cg": Jacobi-preconditioned conjugate gradients on the same
    (SPD) system — the option that scales to large camera counts and to a
    matvec-only distributed formulation."""
    C = cam_valid.shape[0]
    frozen = ~cam_valid
    if cfg.fix_first_camera:
        frozen = frozen | (jnp.arange(C) == 0)
    free = (~frozen).astype(S.dtype)
    mask6 = jnp.repeat(free, 6)
    S2 = S.reshape(6 * C, 6 * C) + lam * jnp.eye(6 * C, dtype=S.dtype)
    S2 = S2 * mask6[:, None] * mask6[None, :]
    S2 = S2 + jnp.diag(1.0 - mask6)                      # identity on frozen
    b2 = b.reshape(-1) * mask6
    if cfg.solver == "schur_cg":
        diag = jnp.diagonal(S2)
        inv_diag = 1.0 / jnp.maximum(diag, 1e-12)
        x, _ = jax.scipy.sparse.linalg.cg(
            lambda v: S2 @ v, b2, M=lambda v: inv_diag * v,
            maxiter=cfg.cg_iters, tol=1e-10)
        return x.reshape(C, 6)
    return jnp.linalg.solve(S2, b2).reshape(C, 6)


def backsub_landmarks(V_inv, bl, Wd, dc, lm_valid):
    """dl = V^-1 (bl - Wd^T dc), masked to valid landmarks."""
    WtD = jnp.einsum("clij,ci->lj", Wd, dc)              # [L, 3]
    dl = jnp.einsum("lij,lj->li", V_inv, bl - WtD)       # [L, 3]
    return dl * lm_valid[:, None]


def apply_increments(R, t, X, dc, dl):
    """Left-multiplicative pose update, additive point update."""
    dR, dt = se3.se3_exp(dc)
    return dR @ R, (dR @ t[..., None])[..., 0] + dt, X + dl


def ba_step(p: BAProblem, R, t, X, lam, cfg: BAConfig):
    """One damped-GN (LM) step: returns proposed (R, t, X)."""
    U, V, bc, bl, Wd = normal_equations(p, R, t, X, cfg)
    S, b, V_inv = schur_camera_system(U, V, bc, bl, Wd, lam)
    dc = solve_cameras(S, b, p.cam_valid, lam, cfg)
    dl = backsub_landmarks(V_inv, bl, Wd, dc, p.lm_valid)
    return apply_increments(R, t, X, dc, dl)


def run_ba(p: BAProblem, cfg: BAConfig) -> BAResult:
    """Levenberg-Marquardt loop (static iteration count, masked accept).

    Traced under float32 matmul precision: the MXU's default bf16 passes
    visibly degrade normal-equation conditioning (worse ATE on TPU)."""
    with jax.default_matmul_precision("float32"):
        return _run_ba_impl(p, cfg)


def _run_ba_impl(p: BAProblem, cfg: BAConfig) -> BAResult:
    R, t, X = p.R, p.t, p.X
    lam = jnp.asarray(cfg.damping_init, X.dtype)
    cost = robust_cost(p, R, t, X, cfg.huber_delta)
    init_cost = cost

    def body(carry, _):
        R, t, X, lam, cost = carry
        Rn, tn, Xn = ba_step(p, R, t, X, lam, cfg)
        new_cost = robust_cost(p, Rn, tn, Xn, cfg.huber_delta)
        accept = new_cost < cost
        R2 = jnp.where(accept, Rn, R)
        t2 = jnp.where(accept, tn, t)
        X2 = jnp.where(accept, Xn, X)
        cost2 = jnp.where(accept, new_cost, cost)
        lam2 = jnp.where(accept, lam * cfg.damping_down, lam * cfg.damping_up)
        lam2 = jnp.clip(lam2, 1e-9, 1e6)
        return (R2, t2, X2, lam2, cost2), new_cost

    (R, t, X, lam, cost), _ = jax.lax.scan(
        body, (R, t, X, lam, cost), None, length=cfg.iters)
    return BAResult(R=R, t=t, X=X, cost=cost, initial_cost=init_cost,
                    lm_lambda=lam)


run_ba_jit = jax.jit(run_ba, static_argnums=1)
