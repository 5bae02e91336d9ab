"""SO(3)/SE(3) utilities (batched, closed-form, jit-safe).

Absent in the reference (no 3D code exists; SURVEY.md §2.3) — required by
two-view reconstruction, BA, and pose-graph optimization. Rotations are
3x3 matrices; tangent increments are 6-vectors [omega, v] applied as
left-multiplied exponentials (world-frame perturbation), the standard
manifold parameterization for GN/LM on poses.

All formulas use the Taylor-guarded Rodrigues forms so gradients are stable
at theta -> 0.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], -1),
        jnp.stack([wz, z, -wx], -1),
        jnp.stack([-wy, wx, z], -1),
    ], -2)


def _exp_coeffs(w: jnp.ndarray):
    """(a, b, c) = (sin t/t, (1-cos t)/t^2, (t-sin t)/t^3) as [..., 1, 1],
    computed NaN-safely for autodiff: the branch variable is t^2 = |w|^2
    (smooth at 0), and sqrt only ever sees values >= eps."""
    t2 = jnp.sum(w * w, axis=-1)[..., None, None]
    small = t2 < 1e-8
    t2s = jnp.where(small, 1.0, t2)
    th = jnp.sqrt(t2s)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(th) / th)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(th)) / t2s)
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (th - jnp.sin(th)) / (t2s * th))
    return a, b, c


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: [..., 3] axis-angle -> [..., 3, 3] rotation."""
    W = hat(w)
    W2 = W @ W
    a, b, _ = _exp_coeffs(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] rotation -> [..., 3] axis-angle (principal branch).

    Autodiff-safe at R = I: arccos is non-differentiable at cos = 1, so near
    the identity the factor theta/(2 sin theta) is evaluated as a series in
    u = 1 - cos(theta) (smooth in R), and arccos only ever sees safe inputs.
    Edges with exact rotation measurements (e.g. pure scale drift in a Sim(3)
    graph) hit this path inside jacfwd."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    u = 1.0 - cos                       # ~ theta^2 / 2, smooth at identity
    small = u < 1e-6
    cos_safe = jnp.where(small, 0.0, cos)
    theta = jnp.arccos(cos_safe)        # only used where ~small
    w_vec = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], -1)
    s = jnp.sin(theta)
    # theta/(2 sin theta): series 1/2 + theta^2/12 + ... with theta^2 = 2u
    factor_small = 0.5 + u[..., None] / 6.0
    factor_large = theta[..., None] / jnp.where(
        s[..., None] < _EPS, 1.0, 2.0 * s[..., None])
    factor = jnp.where(small[..., None], factor_small, factor_large)
    w = factor * w_vec
    # near theta = pi the vector part vanishes; recover axis from diagonal
    near_pi = theta > jnp.pi - 1e-3
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], -1)
    axis2 = jnp.maximum((diag + 1.0) / 2.0, 0.0)
    axis = jnp.sqrt(axis2)
    # fix signs from off-diagonals
    sign_y = jnp.where(R[..., 0, 1] < 0, -1.0, 1.0)
    sign_z = jnp.where(R[..., 0, 2] < 0, -1.0, 1.0)
    axis = axis * jnp.stack([jnp.ones_like(sign_y), sign_y, sign_z], -1)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    w_pi = axis * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w)


def se3_exp(xi: jnp.ndarray):
    """[..., 6] twist [omega, v] -> (R [..., 3, 3], t [..., 3]).

    t = V(omega) v with the SE(3) left Jacobian V."""
    w = xi[..., :3]
    v = xi[..., 3:]
    W = hat(w)
    W2 = W @ W
    a, b, c = _exp_coeffs(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + a * W + b * W2
    V = eye + b * W + c * W2
    t = (V @ v[..., None])[..., 0]
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Inverse of se3_exp -> [..., 6] twist."""
    w = log_so3(R)
    W = hat(w)
    W2 = W @ W
    # V^{-1} = I - W/2 + (1/t^2 - (1+cos)/(2 t sin)) W^2 (guarded).
    # Branch on t^2 (smooth at w = 0) and only sqrt safe values so the
    # Jacobian is NaN-free at the identity (same idiom as _exp_coeffs).
    t2 = jnp.sum(w * w, axis=-1)[..., None, None]
    small = t2 < 1e-8
    t2s = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(t2s)
    s = jnp.sin(theta)
    coeff = jnp.where(
        small, 1.0 / 12.0 + t2 / 720.0,
        1.0 / t2s
        - (1.0 + jnp.cos(theta)) / jnp.where(small, 1.0, 2.0 * theta * s))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), W.shape)
    Vinv = eye - 0.5 * W + coeff * W2
    v = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([w, v], axis=-1)


def compose(Ra, ta, Rb, tb):
    """(Ra, ta) . (Rb, tb): apply b then a."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def transform(R, t, X):
    """Apply [..., 3, 3], [..., 3] to points [..., 3]."""
    return (R @ X[..., None])[..., 0] + t


def relative(Ra, ta, Rb, tb):
    """T_ab = T_a^-1 . T_b (pose of b in a's frame)."""
    Rai, tai = inverse(Ra, ta)
    return compose(Rai, tai, Rb, tb)
