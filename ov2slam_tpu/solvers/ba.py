"""Schur-complement Levenberg-Marquardt bundle adjustment.

Replaces Ceres' SPARSE_SCHUR solver as configured by the reference
(`src/optimizer.cpp:436-479`: Schur ordering {landmarks=0, poses=1}, LM
trust region, Huber loss, 5 iterations) with a fully batched array program:

- residuals/Jacobians for all observations in one vectorized pass
  (analytic, matching `ceres_parametrization.cpp:107-195`: pose Jacobian
  ``[I | -hat(p_cam)]`` for left-multiplicative updates on T_cw),
- Huber IRLS weights instead of Ceres' corrector (same influence function),
- per-landmark 3x3 Hessian blocks eliminated in closed form; the reduced
  camera system is assembled *densely* for local windows (<= 64 poses →
  a <=384x384 system, trivially factorable on-chip) and solved MATRIX-FREE
  for large windows (offline fullBA over hundreds of KFs): block-Jacobi
  preconditioned CG where each S·x product is three O(obs) scatter/gather
  einsums — no (Lw, Kw) cross tensor is ever materialized, so memory
  stays O(observations) like Ceres' SPARSE_SCHUR (`optimizer.cpp:1674`),
- fixed iteration counts with per-iteration accept/reject damping updates
  (no wall-clock aborts: `signalStopLocalBA` semantics become bounded
  compute, `optimizer.cpp:2334-2344`),
- chi2 + depth-positivity outlier sweep between robust and L2 passes
  (`optimizer.cpp:492-627`).

Gauge handling: fixed keyframes get zeroed pose Jacobians (their Schur
blocks are identity-padded), mirroring `optimizer.cpp:396-407`.

f32 throughout; the problem is recentered on the first pose before solving
to keep coordinates small (f64 is emulated-slow on TPU).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import lie


class BAParams(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    T_rl: jnp.ndarray        # (7,) left-cam pose in right-cam frame (cam 1)


def make_ba_params(cam_l, cam_r=None) -> BAParams:
    """Build solver calibration from Camera objects (undistorted model)."""
    T_rl = (lie.pose_inverse(cam_r.T_c0_ci) if cam_r is not None
            else lie.pose_identity())
    return BAParams(
        fx=jnp.asarray(cam_l.fx, jnp.float32),
        fy=jnp.asarray(cam_l.fy, jnp.float32),
        cx=jnp.asarray(cam_l.cx, jnp.float32),
        cy=jnp.asarray(cam_l.cy, jnp.float32),
        T_rl=jnp.asarray(T_rl, jnp.float32),
    )


def _residuals_jacobians(T_cw, points, obs_kf, obs_lm, obs_px, obs_cam,
                         params: BAParams):
    """All observation residuals + Jacobians in one pass.

    Returns r (O, 2), Jp (O, 2, 6), Jl (O, 2, 3), depth_ok (O,).
    """
    Tk = T_cw[obs_kf]                       # (O, 7) camera-from-world
    X = points[obs_lm]                      # (O, 3)
    p_left = lie.pose_apply(Tk, X)          # (O, 3) left-cam point

    is_right = (obs_cam == 1)[:, None]
    p_cam = jnp.where(is_right, lie.pose_apply(params.T_rl[None], p_left),
                      p_left)

    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    depth_ok = z > 1e-3
    zs = jnp.where(jnp.abs(z) < 1e-3, 1e-3, z)
    u = params.fx * x / zs + params.cx
    v = params.fy * y / zs + params.cy
    r = jnp.stack([u, v], -1) - obs_px      # (O, 2)

    iz = 1.0 / zs
    # dπ/dp_cam (O, 2, 3)
    zero = jnp.zeros_like(iz)
    Jproj = jnp.stack([
        params.fx * iz, zero, -params.fx * x * iz * iz,
        zero, params.fy * iz, -params.fy * y * iz * iz,
    ], -1).reshape(-1, 2, 3)

    # dp_cam/d(left-cam point): I for left obs, R_rl for right obs
    R_rl = lie.quat_to_matrix(lie.pose_q(params.T_rl))
    Jp_cam = jnp.where(is_right[..., None],
                       R_rl[None], jnp.eye(3, dtype=p_left.dtype)[None])
    Jpi = Jproj @ Jp_cam                     # (O, 2, 3) d r / d p_left

    # d p_left / d δξ (left-mult on T_cw) = [I | -hat(p_left)]
    hat = lie.so3_hat(p_left)                # (O, 3, 3)
    Jpose = jnp.concatenate([Jpi, -Jpi @ hat], axis=-1)   # (O, 2, 6)

    # d p_left / d X = R_cw
    R_cw = lie.quat_to_matrix(lie.pose_q(Tk))
    Jpoint = Jpi @ R_cw                      # (O, 2, 3)

    return r, Jpose, Jpoint, depth_ok


def _huber_weight(chi2, th):
    """IRLS weight for Huber loss with threshold th (on chi2)."""
    return jnp.where(chi2 <= th, 1.0, jnp.sqrt(th / jnp.maximum(chi2, 1e-12)))


# dense reduced camera system up to this many poses; above it the
# matrix-free PCG path engages (fullBA-scale problems)
DENSE_SCHUR_MAX_KFS = 64
_CG_ITERS = 100


def _schur_pcg(Hpp_d, bp, Hll_inv, bl, Wo, obs_kf, obs_lm, free_pose,
               n_iters: int = _CG_ITERS, Z=None):
    """Matrix-free block-Jacobi-preconditioned CG on the Schur complement.

    S x = (Hpp_d − Σ_l Z_l Hll⁻¹ Z_lᵀ) x. This is the TPU analogue of
    Ceres' ITERATIVE_SCHUR, used for the reference's offline fullBA scale
    (`optimizer.cpp:1674-2332`).

    When ``Z`` — the dense (Lw, Kw, 6, 3) landmark-pose cross tensor — is
    given (memory-guarded by the caller), every CG matvec is pure dense
    einsum work: per-observation scatter-adds serialize on the TPU VPU
    (~25 ms per (O→Kw) scatter at O=350k), so a 400-iteration CG must not
    touch obs-indexed arrays. Without ``Z`` the O(obs) gather/scatter
    formulation is used (beyond-HBM problem sizes).
    """
    Kw = Hpp_d.shape[0]
    free = free_pose[:, None].astype(bool)

    if Z is not None:
        ZH = jnp.einsum("lkab,lbc->lkac", Z, Hll_inv)     # (Lw, Kw, 6, 3)

        def matvec(x):                         # x (Kw, 6)
            x = jnp.where(free, x, 0.0)
            y = jnp.einsum("lkab,ka->lb", Z, x)           # (Lw, 3)
            corr = jnp.einsum("lkab,lb->ka", ZH, y)
            out = jnp.einsum("kab,kb->ka", Hpp_d, x) - corr
            return jnp.where(free, out, x)

        b = bp - jnp.einsum("lkab,lb->ka", ZH, bl)
        b = jnp.where(free, b, 0.0)
    else:
        def matvec(x):                         # x (Kw, 6)
            x = jnp.where(free, x, 0.0)
            y = jnp.zeros_like(bl).at[obs_lm].add(
                jnp.einsum("oab,oa->ob", Wo, x[obs_kf]))  # (Lw, 3)
            t = jnp.einsum("lab,lb->la", Hll_inv, y)
            corr = jnp.zeros_like(bp).at[obs_kf].add(
                jnp.einsum("oab,ob->oa", Wo, t[obs_lm]))
            out = jnp.einsum("kab,kb->ka", Hpp_d, x) - corr
            return jnp.where(free, out, x)

        b = bp - jnp.zeros_like(bp).at[obs_kf].add(
            jnp.einsum("oab,ob->oa", Wo,
                       jnp.einsum("lab,lb->la", Hll_inv, bl)[obs_lm]))
        b = jnp.where(free, b, 0.0)

    # block-Jacobi preconditioner from the (damped) pose Hessian diagonal
    eyeK = jnp.eye(6, dtype=bp.dtype)
    M_inv = jnp.linalg.inv(Hpp_d + 1e-6 * eyeK[None])
    M_inv = jnp.where(free[..., None], M_inv, eyeK[None])

    def precond(v):
        return jnp.einsum("kab,kb->ka", M_inv, v)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def body(carry, _):
        x, r, p, rz = carry
        Ap = matvec(p)
        denom = jnp.sum(p * Ap)
        alpha = jnp.where(jnp.abs(denom) > 1e-20, rz / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(jnp.abs(rz) > 1e-20, rz_new / rz, 0.0)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x0, r0, p0, rz0), None,
                                   length=n_iters)
    return jnp.where(free, x, 0.0)


def _solve_normal_iteration(T_cw, points, lam, obs_kf, obs_lm, obs_px,
                            obs_cam, w_obs, free_pose, params):
    """One damped Schur-LM step. Returns (new_T_cw, new_points, cost)."""
    Kw = T_cw.shape[0]
    Lw = points.shape[0]

    r, Jp, Jl, depth_ok = _residuals_jacobians(
        T_cw, points, obs_kf, obs_lm, obs_px, obs_cam, params)
    w = w_obs * depth_ok
    # zero out Jacobians of gauge-fixed poses
    Jp = Jp * free_pose[obs_kf][:, None, None]

    wJp = Jp * w[:, None, None]
    wJl = Jl * w[:, None, None]

    # block accumulations
    Hpp = jnp.zeros((Kw, 6, 6), r.dtype).at[obs_kf].add(
        jnp.einsum("oik,oil->okl", wJp, Jp))
    Hll = jnp.zeros((Lw, 3, 3), r.dtype).at[obs_lm].add(
        jnp.einsum("oik,oil->okl", wJl, Jl))
    bp = jnp.zeros((Kw, 6), r.dtype).at[obs_kf].add(
        -jnp.einsum("oik,oi->ok", wJp, r))
    bl = jnp.zeros((Lw, 3), r.dtype).at[obs_lm].add(
        -jnp.einsum("oik,oi->ok", wJl, r))

    # LM damping (multiplicative on the diagonal)
    eyeK = jnp.eye(6, dtype=r.dtype)
    eyeL = jnp.eye(3, dtype=r.dtype)
    Hll_d = Hll + (lam * jnp.maximum(
        jnp.diagonal(Hll, axis1=-2, axis2=-1), 1e-6
    ))[..., None] * eyeL[None]
    Hpp_d = Hpp + (lam * jnp.maximum(
        jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-6
    ))[..., None] * eyeK[None]

    Hll_inv = jnp.linalg.inv(
        Hll_d + 1e-8 * eyeL[None])            # (Lw, 3, 3)

    # per-observation cross blocks W_o = Jp^T w Jl
    Wo = jnp.einsum("oik,oil->okl", wJp, Jl)  # (O, 6, 3)

    if Kw > DENSE_SCHUR_MAX_KFS:
        # matrix-free PCG at fullBA scale. Inner iterations scale with the
        # pose count: with block-Jacobi preconditioning on a chain-like
        # covisibility graph, information propagates O(1) poses per CG
        # iteration, so ~100 iters stall on 200+ KF windows. When the
        # (Lw, Kw, 6, 3) cross tensor fits comfortably in HBM, build it
        # once (low-collision scatter: ~2 obs per slot) so the CG loop is
        # scatter-free; beyond that, the O(obs) scatter matvec.
        # guard at 1 GB: _schur_pcg materializes ZH of identical shape, so
        # peak HBM is ~2x this tensor plus Hessian/CG state
        Z_cg = None
        if Lw * Kw * 18 * 4 <= 1024 ** 3:
            Z_cg = jnp.zeros((Lw, Kw, 6, 3), r.dtype).at[
                obs_lm, obs_kf].add(Wo)
        dx_pose = _schur_pcg(Hpp_d, bp, Hll_inv, bl, Wo, obs_kf, obs_lm,
                             free_pose, n_iters=min(max(100, 2 * Kw), 600),
                             Z=Z_cg)
        # back-substitute landmarks: dX = Hll_inv (bl - Z^T dx)
        if Z_cg is not None:
            corr = jnp.einsum("lkab,ka->lb", Z_cg, dx_pose)
        else:
            corr = jnp.zeros_like(bl).at[obs_lm].add(
                jnp.einsum("oab,oa->ob", Wo, dx_pose[obs_kf]))
        dx_lm = jnp.einsum("lab,lb->la", Hll_inv, bl - corr)
        new_T_cw = lie.pose_left_update(T_cw, dx_pose * free_pose[:, None])
        return new_T_cw, points + dx_lm

    Z = jnp.zeros((Lw, Kw, 6, 3), r.dtype).at[obs_lm, obs_kf].add(Wo)

    # Schur complement S = Hpp_d - Σ_l Z_l Hll_inv_l Z_l^T
    ZH = jnp.einsum("lkab,lbc->lkac", Z, Hll_inv)          # (Lw, Kw, 6, 3)
    S_corr = jnp.einsum("lkac,lqdc->kqad", ZH, Z)          # (Kw, Kw, 6, 6)
    S = -S_corr
    S = S.at[jnp.arange(Kw), jnp.arange(Kw)].add(Hpp_d)
    # identity-pad rows/cols of fixed or unobserved poses
    S = jnp.where((free_pose[:, None] * free_pose[None, :])[..., None, None],
                  S, 0.0)
    S = S.at[jnp.arange(Kw), jnp.arange(Kw)].add(
        (~free_pose.astype(bool))[:, None, None] * eyeK[None])

    b_schur = bp - jnp.einsum("lkac,lc->ka", ZH, bl)
    b_schur = b_schur * free_pose[:, None]

    # dense solve of the reduced camera system
    Sd = S.transpose(0, 2, 1, 3).reshape(Kw * 6, Kw * 6)
    bd = b_schur.reshape(Kw * 6)
    dx_pose = jnp.linalg.solve(
        Sd + 1e-6 * jnp.eye(Kw * 6, dtype=r.dtype), bd).reshape(Kw, 6)

    # back-substitute landmarks: dX = Hll_inv (bl - Σ_k Z^T dx_k)
    corr = jnp.einsum("lkab,ka->lb", Z, dx_pose)
    dx_lm = jnp.einsum("lab,lb->la", Hll_inv, bl - corr)

    new_T_cw = lie.pose_left_update(T_cw, dx_pose * free_pose[:, None])
    new_points = points + dx_lm
    return new_T_cw, new_points


def _total_cost(T_cw, points, obs_kf, obs_lm, obs_px, obs_cam, w_obs,
                params, robust_th):
    r, _, _, depth_ok = _residuals_jacobians(
        T_cw, points, obs_kf, obs_lm, obs_px, obs_cam, params)
    chi2 = jnp.sum(r * r, -1)
    # Huber rho
    rho = jnp.where(chi2 <= robust_th, chi2,
                    2.0 * jnp.sqrt(robust_th * jnp.maximum(chi2, 0.0))
                    - robust_th)
    rho = jnp.where(robust_th > 0, rho, chi2)
    return jnp.sum(rho * w_obs * depth_ok)


@partial(jax.jit, static_argnames=("iters",))
def ba_solve(
    kf_poses_wc, kf_fixed, lm_pos,
    obs_kf, obs_lm, obs_px, obs_cam, obs_valid,
    params: BAParams,
    robust_th: float = 5.9915,
    iters: int = 5,
    lam0: float = 1e-3,
):
    """Windowed bundle adjustment (localBA/looseBA/fullBA kernel).

    Args:
      kf_poses_wc: (Kw, 7) world-from-camera poses.
      kf_fixed: (Kw,) bool — gauge-fixed.
      lm_pos: (Lw, 3) world landmarks.
      obs_*: padded observation table (indices into the window arrays;
        obs_kf < 0 for padding).
      robust_th: Huber threshold on chi2 (5.9915 = 95% 2-DoF,
        `optimizer.cpp:47-49`); 0 disables (pure L2 pass).
      iters: LM iterations (reference budget: 5, `optimizer.cpp:460`).

    Returns:
      (new_kf_poses_wc (Kw, 7), new_lm_pos (Lw, 3),
       obs_inlier (O,) bool — chi2 <= robust gate & positive depth,
       final_cost ())
    """
    f32 = jnp.float32
    obs_kf_c = jnp.maximum(obs_kf, 0)
    obs_lm_c = jnp.maximum(obs_lm, 0)

    # recenter on the first pose to keep f32 well-conditioned
    center = kf_poses_wc[0, 4:7]
    poses = kf_poses_wc.astype(f32).at[:, 4:7].add(-center)
    points = lm_pos.astype(f32) - center

    T_cw = lie.pose_inverse(poses)
    free = (~kf_fixed).astype(f32)
    w_valid = obs_valid.astype(f32)

    def iter_body(carry, _):
        T_cw, points, lam = carry
        # Huber IRLS weights at current state; cost0 reuses the same
        # residual pass (one of the reference's 4 R/J sweeps per iter
        # folded away)
        r, _, _, depth_ok = _residuals_jacobians(
            T_cw, points, obs_kf_c, obs_lm_c, obs_px, obs_cam, params)
        chi2 = jnp.sum(r * r, -1)
        w_rob = jnp.where(robust_th > 0,
                          _huber_weight(chi2, robust_th), 1.0)
        w = w_valid * w_rob * depth_ok

        rho0 = jnp.where(chi2 <= robust_th, chi2,
                         2.0 * jnp.sqrt(robust_th * jnp.maximum(chi2, 0.0))
                         - robust_th)
        rho0 = jnp.where(robust_th > 0, rho0, chi2)
        cost0 = jnp.sum(rho0 * w_valid * depth_ok)
        T_new, p_new = _solve_normal_iteration(
            T_cw, points, lam, obs_kf_c, obs_lm_c, obs_px, obs_cam, w,
            free, params)
        cost1 = _total_cost(T_new, p_new, obs_kf_c, obs_lm_c, obs_px,
                            obs_cam, w_valid, params, robust_th)

        accept = cost1 < cost0
        T_cw = jnp.where(accept, T_new, T_cw)
        points = jnp.where(accept, p_new, points)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-6),
                        jnp.minimum(lam * 4.0, 1e2))
        return (T_cw, points, lam), cost1

    (T_cw, points, _), costs = jax.lax.scan(
        iter_body, (T_cw, points, jnp.asarray(lam0, f32)), None,
        length=iters)

    # final outlier classification (chi2 gate + positive depth,
    # `optimizer.cpp:492-592`)
    r, _, _, depth_ok = _residuals_jacobians(
        T_cw, points, obs_kf_c, obs_lm_c, obs_px, obs_cam, params)
    chi2 = jnp.sum(r * r, -1)
    gate = jnp.where(robust_th > 0, robust_th, 5.9915)
    inlier = obs_valid & (chi2 <= gate) & depth_ok

    out_poses = lie.pose_inverse(T_cw).at[:, 4:7].add(center)
    return out_poses, points + center, inlier, costs[-1]


@partial(jax.jit, static_argnames=("iters_robust", "iters_l2"))
def ba_solve_two_pass(
    kf_poses_wc, kf_fixed, lm_pos,
    obs_kf, obs_lm, obs_px, obs_cam, obs_valid,
    params: BAParams,
    robust_th: float = 5.9915,
    iters_robust: int = 5,
    iters_l2: int = 3,
):
    """Robust pass → chi2 outlier removal → L2 refinement on inliers
    (`apply_l2_after_robust`, `optimizer.cpp:600-627`)."""
    poses, points, inlier, _ = ba_solve(
        kf_poses_wc, kf_fixed, lm_pos, obs_kf, obs_lm, obs_px, obs_cam,
        obs_valid, params, robust_th=robust_th, iters=iters_robust)
    poses, points, inlier2, cost = ba_solve(
        poses, kf_fixed, points, obs_kf, obs_lm, obs_px, obs_cam,
        obs_valid & inlier, params, robust_th=0.0, iters=iters_l2)
    return poses, points, inlier & inlier2, cost
