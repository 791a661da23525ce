"""SE(3)/SO(3) Lie-group operations, batched and jit-friendly.

Replaces the reference's ad-hoc Eigen pose handling (4x4 cv::Mat poses in
src/Frame.cpp:212-217, src/KeyFrame.cpp, quaternion use in
src/Sim3Solver.cpp:51-68) with a functional tangent-space parameterization
used by the LM optimizer (tangent = [rho, phi]: translation first, rotation
second, matching the g2o SE3Quat convention the reference's optimizer relied
on via g2o types, src/Optimizer.cpp:3-10).

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of w (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation.

    Uses Taylor-stable coefficients near theta=0 so gradients are finite.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    # sin(t)/t and (1-cos(t))/t^2 with series fallbacks.
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation -> (..., 3) axis-angle. Stable away from pi.

    Uses theta = atan2(|vee(R - R^T)|/2, (tr - 1)/2) instead of arccos so the
    derivative is finite at the identity (arccos'(1) = -inf would poison
    jacfwd-based pose-graph optimization, optim/pose_graph.py).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # vee of the antisymmetric part; |v| = 2 sin(theta)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = 0.5 * jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-24)
    theta = jnp.arctan2(sin_t, cos_t)
    small = theta < 1e-4
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / (2.0 * jnp.maximum(sin_t, _EPS)))
    w_generic = scale[..., None] * v
    # Near pi: fall back to diagonal extraction.
    near_pi = theta > jnp.pi - 1e-3
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.maximum((diag - cos_t[..., None]) / jnp.maximum(1.0 - cos_t[..., None], _EPS), 0.0)
    axis = jnp.sqrt(axis2)
    # Fix signs from off-diagonal sums (sign of v works when nonzero).
    sign = jnp.where(v >= 0, 1.0, -1.0)
    w_pi = theta[..., None] * axis * sign
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def _so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J of SO(3): exp_se3 translation coupling."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * (W @ W)


def exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) tangent [rho, phi] -> (..., 4, 4) SE3 matrix."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = exp_so3(phi)
    t = jnp.einsum("...ij,...j->...i", _so3_left_jacobian(phi), rho)
    return make_se3(R, t)


def log_se3(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) SE3 -> (..., 6) tangent [rho, phi]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = log_so3(R)
    J = _so3_left_jacobian(phi)
    rho = jnp.linalg.solve(J, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def make_se3(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_se3(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def se3_compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to points (..., N, 3) (or (..., 3))."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    if pts.ndim == T.ndim - 1:  # (..., N, 3) with T (..., 4, 4)
        return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]
    return jnp.einsum("...ij,...j->...i", R, pts) + t


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) as (w, x, y, z) -> rotation matrix.

    Note the reference's Sim3Solver fed Horn's (w,x,y,z) eigenvector into
    Eigen's (x,y,z,w) constructor (src/Sim3Solver.cpp:51-52, a defect per
    SURVEY.md §2.4); here the convention is explicit.
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), branch-free.

    Uses the 4-candidate construction (one per largest diagonal term) and
    selects with where(), so it is vmappable and jit-safe.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def cand(t, a, b, c, d):
        # q = [a, b, c, d] / (2 sqrt(t)); with a == t this gives the usual
        # 0.25 * S diagonal term (S = 2 sqrt(t)).
        return jnp.stack([a, b, c, d], axis=-1) / jnp.sqrt(
            jnp.maximum(4.0 * t, _EPS)
        )[..., None]

    # candidate 0: trace
    q0 = cand(1.0 + tr, 1.0 + tr, m21 - m12, m02 - m20, m10 - m01)
    # candidate 1: m00 largest
    q1 = cand(1.0 + m00 - m11 - m22, m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20)
    # candidate 2: m11 largest
    q2 = cand(1.0 + m11 - m00 - m22, m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21)
    # candidate 3: m22 largest
    q3 = cand(1.0 + m22 - m00 - m11, m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11)

    c0 = tr > 0
    c1 = (m00 > m11) & (m00 > m22)
    c2 = m11 > m22
    q = jnp.where(
        c0[..., None], q0, jnp.where(c1[..., None], q1, jnp.where(c2[..., None], q2, q3))
    )
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
