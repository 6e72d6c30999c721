"""SE(3)/SO(3) Lie-group operations on batched JAX arrays.

This is the TPU-native replacement for the reference's vendored Sophus
(`Thirdparty/Sophus/sophus/{so3,se3}.hpp`): every operation is a pure
function over arrays with arbitrary leading batch dimensions, so poses can
live in fixed-capacity SoA arrays (``(K, 7)``) and be transformed with
``vmap``-free broadcasting inside jitted solvers.

Pose layout: a pose is a ``(..., 7)`` array ``[qw, qx, qy, qz, tx, ty, tz]``
representing ``T = (R(q), t)`` acting on points as ``x' = R x + t``. The
update convention matches the reference's left-multiplicative SE(3)
parameterization (`include/ceres_parametrization/ceres_parametrization/
se3left_parametrization.hpp:39-73`): ``T_new = exp(dx) * T``.

All functions are f32/f64 polymorphic; tests run in f64 on CPU, the runtime
uses f32 (TPU native) with f64 promotion where solver conditioning needs it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# --------------------------------------------------------------------------
# Quaternion primitives (w, x, y, z layout)
# --------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(q1, q2):
    """Hamilton product q1 ⊗ q2 (batched)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vectors ``v`` (..., 3) by quaternions ``q`` (..., 4)."""
    qv = q[..., 1:4]
    qw = q[..., 0:1]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def quat_to_matrix(q):
    """Unit quaternion (..., 4) → rotation matrix (..., 3, 3)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m):
    """Rotation matrix (..., 3, 3) → unit quaternion (..., 4), w ≥ 0.

    Branch-free Shepperd's method: compute all four candidate quaternions
    and select the best-conditioned one (largest pivot), which is the
    TPU-friendly re-expression of the usual if/else ladder.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Four candidates, one per pivot choice.
    qw0 = safe_sqrt(1.0 + tr) / 2.0
    c0 = jnp.stack(
        [qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
         (m10 - m01) / (4 * qw0)], axis=-1)

    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    c1 = jnp.stack(
        [(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
         (m02 + m20) / (4 * qx1)], axis=-1)

    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    c2 = jnp.stack(
        [(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
         (m12 + m21) / (4 * qy2)], axis=-1)

    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    c3 = jnp.stack(
        [(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
         (m12 + m21) / (4 * qz3), qz3], axis=-1)

    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22,
                        m22 - m00 - m11], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32),
                            axis=-2)[..., 0, :]
    # Canonicalize sign (w >= 0) and renormalize.
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    return quat_normalize(q)


# --------------------------------------------------------------------------
# SO(3) exp / log
# --------------------------------------------------------------------------

def so3_exp(w):
    """Axis-angle (..., 3) → unit quaternion (..., 4). Taylor-safe at 0."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    half = 0.5 * theta
    small = theta2 < _EPS
    # sin(θ/2)/θ with Taylor fallback: 1/2 - θ²/48
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / jnp.where(small, 1.0, theta))
    qw = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return quat_normalize(jnp.concatenate([qw, k * w], axis=-1))


def so3_log(q):
    """Unit quaternion (..., 4) → axis-angle (..., 3). Taylor-safe at 0,
    including under forward-mode AD: every quantity the SELECTED small
    branch touches must have finite tangents at qv = 0, so the Taylor
    term is driven by sum(qv²) (clean derivative) — NOT by
    ||qv||/arctan2, whose sqrt-at-zero tangent is NaN and used to leak
    NaN Jacobians into zero-weight padded pose-graph edges."""
    q = jnp.where(q[..., 0:1] < 0, -q, q)  # w >= 0 ⇒ θ in [0, π]
    qw = jnp.clip(q[..., 0:1], -1.0, 1.0)
    qv = q[..., 1:4]
    sh2 = jnp.sum(qv * qv, axis=-1, keepdims=True)   # sin²(θ/2)
    small = sh2 < _EPS * _EPS
    sin_half = jnp.sqrt(jnp.where(small, 1.0, sh2))
    half = jnp.arctan2(sin_half, qw)
    # θ / sin(θ/2) = 2·arcsin(s)/s ≈ 2 + s²/3 for small s
    scale = jnp.where(small, 2.0 + sh2 / 3.0, 2.0 * half / sin_half)
    return scale * qv


def so3_hat(w):
    """(..., 3) → skew-symmetric (..., 3, 3)."""
    zeros = jnp.zeros_like(w[..., 0])
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    m = jnp.stack([zeros, -wz, wy, wz, zeros, -wx, -wy, wx, zeros], axis=-1)
    return m.reshape(w.shape[:-1] + (3, 3))


def _so3_left_jacobian(w):
    """Left Jacobian J_l of SO(3) (..., 3, 3), Taylor-safe."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    W = so3_hat(w)
    W2 = W @ W
    small = theta2 < _EPS
    safe = jnp.where(small, 1.0, theta)
    A = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe**2)
    B = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / safe**3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A * W + B * W2


# --------------------------------------------------------------------------
# SE(3) poses: (..., 7) = [qw qx qy qz | tx ty tz]
# --------------------------------------------------------------------------

def pose_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0, 0, 0, 0, 0, 0], dtype=dtype)


def make_pose(q, t):
    return jnp.concatenate([q, t], axis=-1)


def pose_q(T):
    return T[..., 0:4]


def pose_t(T):
    return T[..., 4:7]


def pose_from_Rt(R, t):
    return make_pose(matrix_to_quat(R), t)


def pose_to_matrix(T):
    """(..., 7) → homogeneous (..., 4, 4)."""
    R = quat_to_matrix(pose_q(T))
    t = pose_t(T)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), T.shape[:-1] + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def pose_from_matrix(M):
    return make_pose(matrix_to_quat(M[..., :3, :3]), M[..., :3, 3])


def pose_compose(Ta, Tb):
    """Ta * Tb (batched)."""
    qa, ta = pose_q(Ta), pose_t(Ta)
    qb, tb = pose_q(Tb), pose_t(Tb)
    return make_pose(quat_normalize(quat_mul(qa, qb)),
                     quat_rotate(qa, tb) + ta)


def pose_inverse(T):
    q, t = pose_q(T), pose_t(T)
    qinv = quat_conj(q)
    return make_pose(qinv, -quat_rotate(qinv, t))


def pose_apply(T, pts):
    """Apply pose to points (..., 3): R @ p + t."""
    return quat_rotate(pose_q(T), pts) + pose_t(T)


def se3_exp(xi):
    """se(3) twist (..., 6) = [v | w] → pose (..., 7).

    Convention matches Sophus / the reference's left parameterization:
    translation part first, rotation part second
    (`se3left_parametrization.hpp:56-63` updates t += J dx[:3], R = exp(dx[3:]) R
    — we use the full SE3 exp which agrees to first order).
    """
    v, w = xi[..., 0:3], xi[..., 3:6]
    q = so3_exp(w)
    V = _so3_left_jacobian(w)
    t = jnp.squeeze(V @ v[..., None], -1)
    return make_pose(q, t)


def se3_log(T):
    """pose (..., 7) → twist (..., 6) = [v | w]."""
    q, t = pose_q(T), pose_t(T)
    w = so3_log(q)
    Vinv = jnp.linalg.inv(_so3_left_jacobian(w))
    v = jnp.squeeze(Vinv @ t[..., None], -1)
    return jnp.concatenate([v, w], axis=-1)


def pose_left_update(T, xi):
    """Left-multiplicative retraction: exp(xi) * T.

    This is the update rule used by every solver, mirroring
    `se3left_parametrization.hpp:39-73` (SE3LeftParameterization::Plus).
    """
    return pose_compose(se3_exp(xi), T)


def pose_relative(Ta, Tb):
    """T_ab = Ta⁻¹ * Tb."""
    return pose_compose(pose_inverse(Ta), Tb)


def pose_distance(Ta, Tb):
    """(rotation angle [rad], translation distance) between two poses."""
    rel = pose_relative(Ta, Tb)
    rot = jnp.linalg.norm(so3_log(pose_q(rel)), axis=-1)
    trans = jnp.linalg.norm(pose_t(rel), axis=-1)
    return rot, trans


def pose_slerp(Ta, Tb, alpha):
    """Screw-linear interpolation between poses (for viz/tests)."""
    rel = pose_relative(Ta, Tb)
    return pose_compose(Ta, se3_exp(alpha * se3_log(rel)))
