"""Batched two-view triangulation.

Replaces `MultiViewGeometry::triangulate` (`src/multi_view_geometry.cpp:
53-142`), which dispatches to OpenGV's midpoint method (`triangulate2`,
`:83-99`) or an OpenCV SVD-DLT fallback. Both are provided here as batched
closed-form array programs — the TPU-idiomatic form triangulates *all*
candidate pairs at once instead of looping.

Conventions: ``T_lr`` is the pose of view r in view l's frame (x_l = R x_r
+ t); bearings are unit 3-vectors in each camera frame.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import lie


def triangulate_midpoint(T_lr, bv_l, bv_r):
    """Midpoint triangulation (OpenGV triangulate2 equivalent).

    Args:
      T_lr: (..., 7) pose of right view in left frame.
      bv_l: (..., 3) unit bearings in left frame.
      bv_r: (..., 3) unit bearings in right frame.

    Returns:
      (..., 3) points in the *left* camera frame (midpoint of the common
      perpendicular of the two rays).
    """
    t = lie.pose_t(T_lr)
    d1 = bv_l
    d2 = lie.quat_rotate(lie.pose_q(T_lr), bv_r)  # right ray in left frame

    # Solve [d1 -d2] [l1 l2]^T ≈ t in least squares (2x2 normal equations).
    a = jnp.sum(d1 * d1, axis=-1)
    b = -jnp.sum(d1 * d2, axis=-1)
    c = jnp.sum(d2 * d2, axis=-1)
    e1 = jnp.sum(d1 * t, axis=-1)
    e2 = -jnp.sum(d2 * t, axis=-1)
    det = a * c - b * b
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    l1 = (c * e1 - b * e2) / det
    l2 = (a * e2 - b * e1) / det
    p1 = d1 * l1[..., None]
    p2 = t + d2 * l2[..., None]
    return 0.5 * (p1 + p2)


def triangulate_dlt(T_lr, bv_l, bv_r):
    """SVD-DLT triangulation (OpenCV fallback path equivalent,
    `multi_view_geometry.cpp:103-142`). Same signature/frames as
    :func:`triangulate_midpoint`. Batched 4x4 SVD."""
    # projection matrices: left = [I|0], right = inv(T_lr) = [R^T | -R^T t]
    M_rl = lie.pose_to_matrix(lie.pose_inverse(T_lr))  # (..., 4, 4)
    P1 = jnp.broadcast_to(
        jnp.eye(3, 4, dtype=T_lr.dtype), T_lr.shape[:-1] + (3, 4))
    P2 = M_rl[..., :3, :]

    # normalized image coords (perspective division of bearings)
    x1 = bv_l[..., 0:2] / bv_l[..., 2:3]
    x2 = bv_r[..., 0:2] / bv_r[..., 2:3]

    A = jnp.stack(
        [
            x1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
            x1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
            x2[..., 0, None] * P2[..., 2, :] - P2[..., 0, :],
            x2[..., 1, None] * P2[..., 2, :] - P2[..., 1, :],
        ],
        axis=-2,
    )  # (..., 4, 4)
    _, _, vt = jnp.linalg.svd(A)
    X = vt[..., 3, :]
    w = X[..., 3:4]
    return X[..., 0:3] / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)


def reprojection_checks(T_lr, bv_l, bv_r, pts_l, fx, max_reproj_err,
                        min_depth: float = 0.0):
    """Depth & symmetric reprojection gates used after triangulation
    (`mapper.cpp:310-329` and `:427-448`): positive depth in both views and
    angular reprojection error under ``max_reproj_err`` px (converted via
    focal length ``fx``).

    Returns a boolean mask (...,).
    """
    pts_r = lie.pose_apply(lie.pose_inverse(T_lr), pts_l)
    ok_depth = (pts_l[..., 2] > min_depth) & (pts_r[..., 2] > min_depth)

    def px_err(pts, bv):
        proj = pts[..., 0:2] / jnp.where(
            jnp.abs(pts[..., 2:3]) < 1e-12, 1e-12, pts[..., 2:3])
        obs = bv[..., 0:2] / bv[..., 2:3]
        return fx * jnp.linalg.norm(proj - obs, axis=-1)

    ok_err = (px_err(pts_l, bv_l) < max_reproj_err) & (
        px_err(pts_r, bv_r) < max_reproj_err)
    return ok_depth & ok_err
