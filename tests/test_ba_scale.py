"""Large-window BA: the matrix-free PCG Schur path (round-1 verdict #3).

`ba_solve` / `ba_solve_invdepth` switch from the dense reduced camera
system to block-Jacobi-preconditioned CG above DENSE_SCHUR_MAX_KFS poses,
keeping memory O(observations) — the TPU analogue of Ceres' sparse /
iterative Schur used by the reference's offline fullBA
(`optimizer.cpp:1674-2332`). These tests build fullBA-scale problems
(hundreds of KFs, thousands of landmarks) with a vectorized generator and
pin convergence; a small-problem test forces the CG path and checks it
agrees with the dense solve.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ov2slam_tpu.solvers.ba as ba_mod
from ov2slam_tpu.solvers.ba import BAParams, ba_solve
from ov2slam_tpu.solvers.ba_invdepth import ba_solve_invdepth
from ov2slam_tpu.utils import lie_np

FX = FY = 458.0
CX, CY = 376.0, 240.0
BASELINE = 0.11
W, H = 752, 480


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def circle_ba_problem(rng, n_kf, n_lm, obs_per_kf=200, stereo=True,
                      noise_px=0.25, radius=8.0):
    """Vectorized fullBA-scale generator: cameras on a circle looking
    outward, landmarks in an annulus outside the circle."""
    ang = np.linspace(0, 2 * np.pi, n_kf, endpoint=False)
    c, s = np.cos(ang), np.sin(ang)
    t = np.stack([radius * c, radius * s, 0.05 * np.sin(3 * ang)], -1)
    # camera +z (forward) points outward, +y is world +z
    R_wc = np.zeros((n_kf, 3, 3))
    R_wc[:, :, 0] = np.stack([-s, c, np.zeros_like(s)], -1)   # right
    R_wc[:, :, 1] = np.array([0.0, 0.0, 1.0])                  # down
    R_wc[:, :, 2] = np.stack([c, s, np.zeros_like(s)], -1)     # forward
    M = np.zeros((n_kf, 4, 4))
    M[:, :3, :3] = R_wc
    M[:, :3, 3] = t
    M[:, 3, 3] = 1.0
    gt_poses = lie_np.pose_from_matrix(M).astype(np.float32)

    phi = rng.uniform(0, 2 * np.pi, n_lm)
    r0 = radius + rng.uniform(2.0, 6.0, n_lm)
    lz = rng.uniform(-2.0, 2.0, n_lm)
    lms = np.stack([r0 * np.cos(phi), r0 * np.sin(phi), lz],
                   -1).astype(np.float32)

    # vectorized projection of every landmark into every camera
    T_cw = lie_np.pose_inverse(gt_poses.astype(np.float64))   # (K, 7)
    pc = lie_np.pose_apply(T_cw[:, None, :],
                           lms.astype(np.float64)[None])      # (K, L, 3)
    u = FX * pc[..., 0] / np.maximum(pc[..., 2], 1e-6) + CX
    v = FY * pc[..., 1] / np.maximum(pc[..., 2], 1e-6) + CY
    vis = ((pc[..., 2] > 0.5) & (pc[..., 2] < 12.0)
           & (u > 10) & (u < W - 10) & (v > 10) & (v < H - 10))

    obs_kf, obs_lm, obs_px, obs_cam = [], [], [], []
    T_rl = np.concatenate([[1, 0, 0, 0],
                           [-BASELINE, 0, 0]]).astype(np.float64)
    for k in range(n_kf):
        li = np.nonzero(vis[k])[0]
        if len(li) > obs_per_kf:
            li = rng.choice(li, obs_per_kf, replace=False)
        n = len(li)
        obs_kf.append(np.full(n, k, np.int32))
        obs_lm.append(li.astype(np.int32))
        obs_px.append(np.stack([u[k, li], v[k, li]], -1)
                      + rng.normal(0, noise_px, (n, 2)))
        obs_cam.append(np.zeros(n, np.int8))
        if stereo:
            pr = lie_np.pose_apply(T_rl, pc[k, li])
            ur = FX * pr[:, 0] / pr[:, 2] + CX
            vr = FY * pr[:, 1] / pr[:, 2] + CY
            obs_kf.append(np.full(n, k, np.int32))
            obs_lm.append(li.astype(np.int32))
            obs_px.append(np.stack([ur, vr], -1)
                          + rng.normal(0, noise_px, (n, 2)))
            obs_cam.append(np.ones(n, np.int8))

    obs_kf = np.concatenate(obs_kf)
    obs_lm = np.concatenate(obs_lm)
    obs_px = np.concatenate(obs_px).astype(np.float32)
    obs_cam = np.concatenate(obs_cam)
    params = BAParams(fx=jnp.float32(FX), fy=jnp.float32(FY),
                      cx=jnp.float32(CX), cy=jnp.float32(CY),
                      T_rl=jnp.asarray(T_rl, jnp.float32))
    return gt_poses, lms, dict(
        obs_kf=jnp.asarray(obs_kf), obs_lm=jnp.asarray(obs_lm),
        obs_px=jnp.asarray(obs_px), obs_cam=jnp.asarray(obs_cam),
        obs_valid=jnp.ones(len(obs_kf), bool), params=params)


def perturb(rng, gt_poses, lms, pose_sigma=0.02, lm_sigma=0.04,
            fix_first=2):
    poses = gt_poses.copy()
    for k in range(fix_first, len(poses)):
        xi = rng.normal(0, pose_sigma, 6)
        # body-frame perturbation: position error does not scale with the
        # trajectory radius (left-composition would rotate the 8 m lever)
        poses[k] = lie_np.pose_compose(
            poses[k], np.concatenate([lie_np.so3_exp(xi[3:]), xi[:3]])
        ).astype(np.float32)
    lms_n = lms + rng.normal(0, lm_sigma, lms.shape).astype(np.float32)
    fixed = np.zeros(len(poses), bool)
    fixed[:fix_first] = True
    return poses, lms_n, fixed


def max_pose_err(est, gt):
    rot, tr = lie_np.pose_distance(est.astype(np.float64),
                                   gt.astype(np.float64))
    return float(np.max(rot)), float(np.max(tr))


def test_xyz_cg_path_converges_at_fullba_scale(rng):
    """96-KF ring (CG path): from a perturbed start the solve must reach
    the SAME cost as a solve started at ground truth (ring-bending modes
    are near-unobservable, so pose equality is the wrong criterion), with
    absolute pose errors bounded."""
    n_kf = 96
    assert n_kf > ba_mod.DENSE_SCHUR_MAX_KFS   # CG path engages
    gt_poses, lms, obs = circle_ba_problem(rng, n_kf, 4000)
    poses0, lms0, fixed = perturb(rng, gt_poses, lms)
    r0, t0 = max_pose_err(poses0, gt_poses)

    new_poses, new_lms, inlier, cost = ba_solve(
        jnp.asarray(poses0), jnp.asarray(fixed), jnp.asarray(lms0),
        iters=8, robust_th=0.0, **obs)
    _, _, _, cost_gt = ba_solve(
        jnp.asarray(gt_poses), jnp.asarray(fixed), jnp.asarray(lms),
        iters=8, robust_th=0.0, **obs)

    r1, t1 = max_pose_err(np.array(new_poses), gt_poses)
    assert float(cost) < 1.01 * float(cost_gt), (float(cost), float(cost_gt))
    # pose bounds are sanity checks only: the ring's bending modes are
    # near-flat, so within-1%-cost solutions can sit degrees away in the
    # weakly observable directions
    assert t1 < 0.05 and t1 < 0.5 * t0, (t0, t1)
    assert r1 < 0.05 and r1 < 0.6 * r0, (r0, r1)
    assert float(np.mean(np.array(inlier))) > 0.95


def test_invdepth_cg_path_converges_at_fullba_scale(rng):
    n_kf = 96
    gt_poses, lms, obs = circle_ba_problem(rng, n_kf, 4000)
    poses0, _, fixed = perturb(rng, gt_poses, lms, lm_sigma=0.0)

    # anchored inverse-depth state from the FIRST observing keyframe,
    # with rho perturbed
    obs_kf = np.array(obs["obs_kf"])
    obs_lm = np.array(obs["obs_lm"])
    obs_px = np.array(obs["obs_px"])
    obs_cam = np.array(obs["obs_cam"])
    Lw = len(lms)
    anchor = np.full(Lw, -1, np.int32)
    ray = np.zeros((Lw, 2), np.float32)
    for o in range(len(obs_kf)):
        l = obs_lm[o]
        if anchor[l] < 0 and obs_cam[o] == 0:
            anchor[l] = obs_kf[o]
            ray[l] = [(obs_px[o, 0] - CX) / FX, (obs_px[o, 1] - CY) / FY]
    valid_lm = anchor >= 0
    T_cw_a = lie_np.pose_inverse(
        gt_poses[np.maximum(anchor, 0)].astype(np.float64))
    z = np.maximum(
        lie_np.pose_apply(T_cw_a, lms.astype(np.float64))[:, 2], 1e-3)
    rho_gt = (1.0 / z).astype(np.float32)
    rho0 = rho_gt * (1.0 + rng.normal(0, 0.05, Lw).astype(np.float32))
    obs_valid = np.array(obs["obs_valid"]) & valid_lm[obs_lm]

    new_poses, new_pos, new_rho, inlier, cost = ba_solve_invdepth(
        jnp.asarray(poses0), jnp.asarray(fixed), jnp.asarray(rho0),
        jnp.asarray(anchor), jnp.asarray(ray),
        obs["obs_kf"], obs["obs_lm"], obs["obs_px"], obs["obs_cam"],
        jnp.asarray(obs_valid), obs["params"], iters=8, robust_th=0.0)
    _, _, _, _, cost_gt = ba_solve_invdepth(
        jnp.asarray(gt_poses), jnp.asarray(fixed), jnp.asarray(rho_gt),
        jnp.asarray(anchor), jnp.asarray(ray),
        obs["obs_kf"], obs["obs_lm"], obs["obs_px"], obs["obs_cam"],
        jnp.asarray(obs_valid), obs["params"], iters=8, robust_th=0.0)
    r0_, t0_ = max_pose_err(poses0, gt_poses)
    r1, t1 = max_pose_err(np.array(new_poses), gt_poses)
    assert float(cost) < 1.01 * float(cost_gt), (float(cost), float(cost_gt))
    assert t1 < 0.05 and t1 < 0.5 * t0_, (t0_, t1)
    assert r1 < 0.05 and r1 < 0.6 * r0_, (r0_, r1)


def test_cg_agrees_with_dense_on_small_problem(rng):
    """Force the CG path on a small problem and compare with the dense
    solve: identical problems must land on the same optimum."""
    gt_poses, lms, obs = circle_ba_problem(rng, 24, 800, obs_per_kf=120)
    poses0, lms0, fixed = perturb(rng, gt_poses, lms)

    dense_poses, _, _, _ = ba_solve(
        jnp.asarray(poses0), jnp.asarray(fixed), jnp.asarray(lms0),
        iters=6, **obs)

    old = ba_mod.DENSE_SCHUR_MAX_KFS
    try:
        ba_mod.DENSE_SCHUR_MAX_KFS = 8
        jax.clear_caches()   # the path branch is baked in at trace time
        cg_poses, _, _, _ = ba_solve(
            jnp.asarray(poses0), jnp.asarray(fixed), jnp.asarray(lms0),
            iters=6, **obs)
    finally:
        ba_mod.DENSE_SCHUR_MAX_KFS = old
        jax.clear_caches()

    rot, tr = lie_np.pose_distance(
        np.array(dense_poses, np.float64), np.array(cg_poses, np.float64))
    # the two paths take slightly different LM steps (finite CG tolerance
    # shifts accept/reject decisions), so agreement is to solver noise,
    # not bitwise: mm-level on an 8 m ring
    assert float(np.max(tr)) < 5e-3
    assert float(np.max(rot)) < 1e-3
