"""Batched P3P (Kneip closed form) and RANSAC/LMedS absolute-pose solvers.

Replaces `MultiViewGeometry::p3pRansac` / `p3pLMedS`
(`src/multi_view_geometry.cpp:144-346`), which loop OpenGV's Kneip P3P
inside a sequential SAC loop. The TPU-idiomatic inversion: draw *all*
minimal samples up front, solve every P3P in one batched closed-form pass
(quartic roots via Ferrari, `geometry/poly.py`), score every candidate pose
against every correspondence with one big einsum, and take the argmax
consensus — no data-dependent control flow, fully jittable.

P3P math follows L. Kneip, D. Scaramuzza, R. Siegwart, "A Novel
Parametrization of the Perspective-Three-Point Problem" (CVPR 2011).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils import lie
from .poly import solve_quartic_real


def _normalize(v, axis=-1):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), 1e-12)


def p3p_kneip(bearings, points):
    """Closed-form P3P: up to 4 camera poses from 3 bearing/point pairs.

    Args:
      bearings: (..., 3, 3) unit bearing vectors (camera frame, rows).
      points:   (..., 3, 3) corresponding world points (rows).

    Returns:
      poses: (..., 4, 7) world-from-camera poses T_wc (camera position C and
        orientation R_wc such that ``lambda * f_i = R_wc^T (P_i - C)``).
      valid: (..., 4) bool mask of real solutions.
    """
    dtype = bearings.dtype
    f1, f2, f3 = bearings[..., 0, :], bearings[..., 1, :], bearings[..., 2, :]
    P1, P2, P3 = points[..., 0, :], points[..., 1, :], points[..., 2, :]

    # Orthonormal intermediate camera frame τ = [t1 t2 t3] (rows).
    # Kneip requires f3 to lie in the half-space z_τ < 0; instead of a data
    # swap (branchy) we detect the sign and swap (f1,P1)<->(f2,P2) with where.
    def make_T(f1_, f2_):
        t1 = f1_
        t3 = _normalize(jnp.cross(f1_, f2_))
        t2 = jnp.cross(t3, t1)
        return jnp.stack([t1, t2, t3], axis=-2)

    T0 = make_T(f1, f2)
    f3_t0 = jnp.squeeze(T0 @ f3[..., None], -1)
    swap = (f3_t0[..., 2] > 0)[..., None]

    f1s = jnp.where(swap, f2, f1)
    f2s = jnp.where(swap, f1, f2)
    P1s = jnp.where(swap, P2, P1)
    P2s = jnp.where(swap, P1, P2)
    T = make_T(f1s, f2s)
    f3_t = jnp.squeeze(T @ f3[..., None], -1)

    # Intermediate world frame η = [n1 n2 n3] (rows).
    n1 = _normalize(P2s - P1s)
    n3 = _normalize(jnp.cross(n1, P3 - P1s))
    n2 = jnp.cross(n3, n1)
    N = jnp.stack([n1, n2, n3], axis=-2)

    P3_eta = jnp.squeeze(N @ (P3 - P1s)[..., None], -1)
    p1 = P3_eta[..., 0]
    p2 = P3_eta[..., 1]
    d12 = jnp.linalg.norm(P2s - P1s, axis=-1)

    cos_beta = jnp.sum(f1s * f2s, axis=-1)
    # b = cot(beta), beta = angle(f1, f2)
    b = jnp.sign(cos_beta) * jnp.sqrt(
        jnp.maximum(1.0 / jnp.maximum(1.0 - cos_beta**2, 1e-12) - 1.0, 0.0))

    z3 = jnp.where(jnp.abs(f3_t[..., 2]) < 1e-12, -1e-12, f3_t[..., 2])
    phi1 = f3_t[..., 0] / z3
    phi2 = f3_t[..., 1] / z3

    p1_2, p1_3, p1_4 = p1 * p1, p1**3, p1**4
    p2_2, p2_3, p2_4 = p2 * p2, p2**3, p2**4
    d12_2 = d12 * d12
    b2 = b * b
    phi1_2 = phi1 * phi1
    phi2_2 = phi2 * phi2

    # Kneip 2011 eq. (11) quartic coefficients in cosθ.
    a4 = -phi2_2 * p2_4 - phi1_2 * p2_4 - p2_4
    a3 = (2.0 * p2_3 * d12 * b
          + 2.0 * phi2_2 * p2_3 * d12 * b
          - 2.0 * phi1 * phi2 * p2_3 * d12)
    a2 = (-phi2_2 * p1_2 * p2_2 - phi2_2 * p2_2 * d12_2 * b2
          - phi2_2 * p2_2 * d12_2 + phi2_2 * p2_4 + phi1_2 * p2_4
          + 2.0 * p1 * p2_2 * d12
          + 2.0 * phi1 * phi2 * p1 * p2_2 * d12 * b
          - phi1_2 * p1_2 * p2_2
          + 2.0 * phi2_2 * p1 * p2_2 * d12
          - p2_2 * d12_2 * b2 - 2.0 * p1_2 * p2_2)
    a1 = (2.0 * p1_2 * p2 * d12 * b
          + 2.0 * phi1 * phi2 * p2_3 * d12
          - 2.0 * phi2_2 * p2_3 * d12 * b
          - 2.0 * p1 * p2 * d12_2 * b)
    a0 = (-2.0 * phi1 * phi2 * p1 * p2_2 * d12 * b
          + phi2_2 * p2_2 * d12_2
          + 2.0 * p1_3 * d12 - p1_2 * d12_2
          + phi2_2 * p1_2 * p2_2 - p1_4
          - 2.0 * phi2_2 * p1 * p2_2 * d12
          + phi1_2 * p1_2 * p2_2
          + phi2_2 * p2_2 * d12_2 * b2)

    a4_safe = jnp.where(jnp.abs(a4) < 1e-14, 1e-14, a4)
    cos_theta, valid = solve_quartic_real(
        a3 / a4_safe, a2 / a4_safe, a1 / a4_safe, a0 / a4_safe)
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta**2, 0.0))  # θ ∈ [0, π]

    # expand per-root (..., 4) against per-sample scalars.
    def ex(x):
        return x[..., None]

    cot_alpha_num = (phi1 / jnp.where(jnp.abs(phi2) < 1e-12, 1e-12, phi2)
                     )[..., None] * ex(p1) + cos_theta * ex(p2) - ex(d12 * b)
    cot_alpha_den = (phi1 / jnp.where(jnp.abs(phi2) < 1e-12, 1e-12, phi2)
                     )[..., None] * cos_theta * ex(p2) - ex(p1) + ex(d12)
    cot_alpha = cot_alpha_num / jnp.where(
        jnp.abs(cot_alpha_den) < 1e-12, 1e-12, cot_alpha_den)

    sin_alpha = jnp.sqrt(1.0 / (cot_alpha**2 + 1.0))
    cos_alpha = jnp.sqrt(jnp.maximum(1.0 - sin_alpha**2, 0.0))
    cos_alpha = jnp.where(cot_alpha < 0, -cos_alpha, cos_alpha)

    # Camera center in η frame (Kneip eq. 5) and orientation Q (eq. 6).
    k = ex(d12) * (sin_alpha * ex(b) + cos_alpha)
    C_eta = jnp.stack(
        [cos_alpha * k, sin_alpha * cos_theta * k, sin_alpha * sin_theta * k],
        axis=-1,
    )  # (..., 4, 3)

    # Q: rotation from η to τ (rows as in the paper).
    zr = jnp.zeros_like(cos_theta)
    Q = jnp.stack(
        [
            -cos_alpha, -sin_alpha * cos_theta, -sin_alpha * sin_theta,
            sin_alpha, -cos_alpha * cos_theta, -cos_alpha * sin_theta,
            zr, -sin_theta, cos_theta,
        ],
        axis=-1,
    ).reshape(cos_theta.shape + (3, 3))

    # World camera center: C = P1 + N^T C_η ; orientation R_wc = N^T Q^T T.
    Nt = jnp.swapaxes(N, -1, -2)[..., None, :, :]
    C = P1s[..., None, :] + jnp.squeeze(Nt @ C_eta[..., None], -1)
    # Orientation: R_wc = N^T Q^T T (maps camera coords to world coords).
    R_wc = Nt @ jnp.swapaxes(Q, -1, -2) @ T[..., None, :, :]

    q = lie.matrix_to_quat(R_wc)
    poses = lie.make_pose(q, C)

    # guard NaNs from degenerate samples
    finite = jnp.all(jnp.isfinite(poses), axis=-1)
    poses = jnp.where(finite[..., None], poses,
                      jnp.broadcast_to(lie.pose_identity(dtype), poses.shape))
    return poses, valid & finite


# --------------------------------------------------------------------------
# Batched RANSAC / LMedS
# --------------------------------------------------------------------------

def reproj_errors_px(T_wc, points, px_obs, fx, fy, cx, cy):
    """Pixel reprojection errors of world ``points`` (N,3) observed at
    ``px_obs`` (N,2) under poses ``T_wc`` (..., 7). Returns (..., N)."""
    T_cw = lie.pose_inverse(T_wc)
    pc = lie.pose_apply(T_cw[..., None, :], points)  # (..., N, 3)
    z = pc[..., 2:3]
    behind = z <= 1e-6
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = pc[..., 0] / zs[..., 0] * fx + cx
    v = pc[..., 1] / zs[..., 0] * fy + cy
    err = jnp.sqrt((u - px_obs[..., 0]) ** 2 + (v - px_obs[..., 1]) ** 2)
    return jnp.where(behind[..., 0], 1e9, err)


@partial(jax.jit, static_argnames=("n_iters",))
def p3p_ransac(key, bearings, points, px_obs, valid_mask, fx, fy, cx, cy,
               err_th, n_iters: int = 100):
    """Batched P3P RANSAC (mirrors `p3pRansac`, `multi_view_geometry.cpp:
    168-255`, with the sequential OpenGV sac loop replaced by one shot).

    Args:
      key: PRNG key.
      bearings: (N, 3) unit bearings of current-frame observations.
      points: (N, 3) associated 3D map points (world frame).
      px_obs: (N, 2) observed (undistorted) pixels.
      valid_mask: (N,) bool — which rows are real correspondences (padding
        safe: invalid rows are never sampled as all-valid triplets win ties).
      err_th: inlier threshold in px.
      n_iters: number of minimal samples (all solved in parallel).

    Returns:
      (best_T_wc (7,), inlier_mask (N,), n_inliers ())
    """
    N = points.shape[0]
    probs = valid_mask.astype(jnp.float32) + 1e-9
    idx = jax.random.categorical(
        key, jnp.log(probs)[None, :].repeat(n_iters * 3, 0)
    ).reshape(n_iters, 3)
    sample_ok = valid_mask[idx].all(axis=-1) & (
        (idx[:, 0] != idx[:, 1]) & (idx[:, 0] != idx[:, 2])
        & (idx[:, 1] != idx[:, 2]))

    poses, pvalid = p3p_kneip(bearings[idx], points[idx])  # (it,4,7),(it,4)
    pvalid = pvalid & sample_ok[:, None]
    flat_poses = poses.reshape(-1, 7)
    flat_valid = pvalid.reshape(-1)

    errs = reproj_errors_px(flat_poses, points, px_obs, fx, fy, cx, cy)
    inl = (errs < err_th) & valid_mask[None, :]
    scores = jnp.where(flat_valid, inl.sum(axis=-1), -1)
    best = jnp.argmax(scores)
    best_T = flat_poses[best]
    best_inl = inl[best]
    return best_T, best_inl, scores[best]


@partial(jax.jit, static_argnames=("n_iters",))
def p3p_lmeds(key, bearings, points, px_obs, valid_mask, fx, fy, cx, cy,
              err_th, n_iters: int = 100):
    """Batched P3P LMedS (mirrors `p3pLMedS`, `multi_view_geometry.cpp:
    257-346`): minimize the median squared reprojection error, then report
    inliers under err_th."""
    N = points.shape[0]
    probs = valid_mask.astype(jnp.float32) + 1e-9
    idx = jax.random.categorical(
        key, jnp.log(probs)[None, :].repeat(n_iters * 3, 0)
    ).reshape(n_iters, 3)
    sample_ok = valid_mask[idx].all(axis=-1) & (
        (idx[:, 0] != idx[:, 1]) & (idx[:, 0] != idx[:, 2])
        & (idx[:, 1] != idx[:, 2]))

    poses, pvalid = p3p_kneip(bearings[idx], points[idx])
    pvalid = pvalid & sample_ok[:, None]
    flat_poses = poses.reshape(-1, 7)
    flat_valid = pvalid.reshape(-1)

    errs = reproj_errors_px(flat_poses, points, px_obs, fx, fy, cx, cy)
    # median over valid correspondences only: set invalid to +inf and use
    # sorted index at n_valid/2.
    big = jnp.where(valid_mask[None, :], errs**2, jnp.inf)
    srt = jnp.sort(big, axis=-1)
    n_valid = valid_mask.sum()
    med = srt[:, jnp.clip(n_valid // 2, 0, N - 1)]
    med = jnp.where(flat_valid, med, jnp.inf)
    best = jnp.argmin(med)
    best_T = flat_poses[best]
    inl = (errs[best] < err_th) & valid_mask
    return best_T, inl, inl.sum()
