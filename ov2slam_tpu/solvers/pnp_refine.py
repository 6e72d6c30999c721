"""Motion-only PnP: pose-only Levenberg-Marquardt refinement.

Replaces `MultiViewGeometry::ceresPnP` (`src/multi_view_geometry.cpp:
481-586`): DENSE_QR pose-only BA with Huber loss, chi2 outlier rejection
between passes, and an optional L2 re-solve. The reference budgets ≤5 ms
wall clock; here the budget is a fixed iteration count on a 6x6 system —
microseconds of device time, fully fused.

Jacobians are the pose part of `solvers/ba.py` (analytic,
`ceres_parametrization.cpp:107-195`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import lie


def _pose_residuals(T_cw, points, px_obs, fx, fy, cx, cy):
    p = lie.pose_apply(T_cw[None], points)
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    depth_ok = z > 1e-3
    zs = jnp.where(jnp.abs(z) < 1e-3, 1e-3, z)
    u = fx * x / zs + cx
    v = fy * y / zs + cy
    r = jnp.stack([u, v], -1) - px_obs

    iz = 1.0 / zs
    zero = jnp.zeros_like(iz)
    Jproj = jnp.stack([
        fx * iz, zero, -fx * x * iz * iz,
        zero, fy * iz, -fy * y * iz * iz,
    ], -1).reshape(-1, 2, 3)
    hat = lie.so3_hat(p)
    Jpose = jnp.concatenate([Jproj, -Jproj @ hat], axis=-1)  # (N, 2, 6)
    return r, Jpose, depth_ok


@partial(jax.jit, static_argnames=("iters",))
def pnp_refine(
    T_wc, points, px_obs, valid,
    fx, fy, cx, cy,
    robust_th: float = 5.9915,
    iters: int = 10,
    lam0: float = 1e-4,
):
    """Refine a world-from-camera pose against 2D-3D correspondences.

    Args:
      T_wc: (7,) initial pose (e.g. motion-model prior or P3P output).
      points: (N, 3) world points; px_obs (N, 2) undistorted pixels.
      valid: (N,) bool.
      robust_th: Huber chi2 threshold (0 → pure L2).

    Returns: (T_wc_refined (7,), inlier (N,), final_cost ()).
    """
    f32 = jnp.float32
    center = T_wc[4:7]
    T_cw = lie.pose_inverse(T_wc.astype(f32).at[4:7].add(-center))
    pts = points.astype(f32) - center
    w_valid = valid.astype(f32)

    def body(carry, _):
        T_cw, lam = carry
        r, J, depth_ok = _pose_residuals(T_cw, pts, px_obs, fx, fy, cx, cy)
        chi2 = jnp.sum(r * r, -1)
        w_rob = jnp.where(robust_th > 0,
                          jnp.where(chi2 <= robust_th, 1.0,
                                    jnp.sqrt(robust_th /
                                             jnp.maximum(chi2, 1e-12))),
                          1.0)
        w = w_valid * w_rob * depth_ok

        H = jnp.einsum("oik,o,oil->kl", J, w, J)
        g = -jnp.einsum("oik,o,oi->k", J, w, r)
        Hd = H + lam * jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-6))
        dx = jnp.linalg.solve(Hd + 1e-8 * jnp.eye(6, dtype=f32), g)

        T_new = lie.pose_left_update(T_cw, dx)

        def cost(T):
            r_, _, dok = _pose_residuals(T, pts, px_obs, fx, fy, cx, cy)
            c2 = jnp.sum(r_ * r_, -1)
            rho = jnp.where((robust_th > 0) & (c2 > robust_th),
                            2.0 * jnp.sqrt(robust_th * c2) - robust_th, c2)
            return jnp.sum(rho * w_valid * dok)

        c0, c1 = cost(T_cw), cost(T_new)
        accept = c1 < c0
        T_cw = jnp.where(accept, T_new, T_cw)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8),
                        jnp.minimum(lam * 4.0, 1e2))
        return (T_cw, lam), c1

    (T_cw, _), costs = jax.lax.scan(
        body, (T_cw, jnp.asarray(lam0, f32)), None, length=iters)

    r, _, depth_ok = _pose_residuals(T_cw, pts, px_obs, fx, fy, cx, cy)
    chi2 = jnp.sum(r * r, -1)
    gate = jnp.where(robust_th > 0, robust_th, 5.9915)
    inlier = valid & (chi2 <= gate) & depth_ok

    T_out = lie.pose_inverse(T_cw).at[4:7].add(center)
    return T_out, inlier, costs[-1]


@partial(jax.jit, static_argnames=("iters_robust", "iters_l2"))
def pnp_refine_two_pass(T_wc, points, px_obs, valid, fx, fy, cx, cy,
                        robust_th: float = 5.9915,
                        iters_robust: int = 5, iters_l2: int = 5):
    """Robust pass → outlier removal → L2 pass on inliers (mirrors the
    outlier loop of `ceresPnP`, `multi_view_geometry.cpp:557-581`)."""
    T, inlier, _ = pnp_refine(T_wc, points, px_obs, valid, fx, fy, cx, cy,
                              robust_th=robust_th, iters=iters_robust)
    T, inlier2, cost = pnp_refine(T, points, px_obs, valid & inlier,
                                  fx, fy, cx, cy, robust_th=0.0,
                                  iters=iters_l2)
    return T, inlier & inlier2, cost
