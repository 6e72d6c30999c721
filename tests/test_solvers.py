import jax.numpy as jnp
import numpy as np
import pytest

from ov2slam_tpu.solvers.ba import BAParams, ba_solve, ba_solve_two_pass
from ov2slam_tpu.solvers.pnp_refine import pnp_refine, pnp_refine_two_pass
from ov2slam_tpu.utils import lie_np

FX = FY = 458.0
CX, CY = 376.0, 240.0
BASELINE = 0.11


def synth_ba_problem(rng, n_kf=6, n_lm=120, stereo=False, noise_px=0.0):
    """Ground-truth BA problem on an arc trajectory."""
    gt_poses = []
    for i in range(n_kf):
        t = np.array([0.3 * i, 0.05 * np.sin(i), 0.02 * i])
        q = lie_np.so3_exp(np.array([0.0, 0.03 * i, 0.01 * i]))
        gt_poses.append(np.concatenate([q, t]))
    gt_poses = np.stack(gt_poses).astype(np.float32)

    span = gt_poses[:, 4:7]
    lms = rng.uniform(span.min(0) - [4, 3, 2], span.max(0) + [4, 3, 10],
                      size=(n_lm, 3)).astype(np.float32)

    T_rl = np.concatenate([[1, 0, 0, 0], [-BASELINE, 0, 0]]).astype(np.float32)

    rows = []
    for k in range(n_kf):
        T_cw = lie_np.pose_inverse(gt_poses[k])
        pc = lie_np.pose_apply(T_cw, lms)
        u = FX * pc[:, 0] / pc[:, 2] + CX
        v = FY * pc[:, 1] / pc[:, 2] + CY
        vis = (pc[:, 2] > 0.5) & (u > 10) & (u < 742) & (v > 10) & (v < 470)
        for l in np.nonzero(vis)[0]:
            du, dv = rng.normal(0, noise_px, 2) if noise_px else (0, 0)
            rows.append((k, l, u[l] + du, v[l] + dv, 0))
            if stereo:
                pr = lie_np.pose_apply(T_rl, pc[l])
                ur = FX * pr[0] / pr[2] + CX
                vr = FY * pr[1] / pr[2] + CY
                rows.append((k, l, ur + (rng.normal(0, noise_px) if noise_px else 0), vr, 1))

    O = len(rows)
    obs_kf = np.array([r[0] for r in rows], np.int32)
    obs_lm = np.array([r[1] for r in rows], np.int32)
    obs_px = np.array([[r[2], r[3]] for r in rows], np.float32)
    obs_cam = np.array([r[4] for r in rows], np.int8)
    params = BAParams(
        fx=jnp.float32(FX), fy=jnp.float32(FY),
        cx=jnp.float32(CX), cy=jnp.float32(CY),
        T_rl=jnp.asarray(T_rl))
    return gt_poses, lms, dict(
        obs_kf=jnp.asarray(obs_kf), obs_lm=jnp.asarray(obs_lm),
        obs_px=jnp.asarray(obs_px), obs_cam=jnp.asarray(obs_cam),
        obs_valid=jnp.ones(O, bool), params=params)


def perturb(rng, gt_poses, lms, pose_sigma=0.03, lm_sigma=0.05, fix_first=2):
    poses = gt_poses.copy()
    for k in range(fix_first, len(poses)):
        xi = rng.normal(0, pose_sigma, 6)
        poses[k] = lie_np.pose_compose(
            np.concatenate([lie_np.so3_exp(xi[3:]), xi[:3]]), poses[k]
        ).astype(np.float32)
    lms_n = lms + rng.normal(0, lm_sigma, lms.shape).astype(np.float32)
    fixed = np.zeros(len(poses), bool)
    fixed[:fix_first] = True
    return poses, lms_n, fixed


def pose_errors(est, gt):
    rot, tr = lie_np.pose_distance(est.astype(np.float64), gt.astype(np.float64))
    return np.max(rot), np.max(tr)


# ---------------------------------------------------------------- BA mono #

def test_ba_converges_to_ground_truth_mono(rng):
    gt_poses, lms, obs = synth_ba_problem(rng, stereo=False)
    poses0, lms0, fixed = perturb(rng, gt_poses, lms)
    new_poses, new_lms, inlier, cost = ba_solve(
        jnp.asarray(poses0), jnp.asarray(fixed), jnp.asarray(lms0),
        **obs, robust_th=5.9915, iters=10)
    rot_err, t_err = pose_errors(np.array(new_poses), gt_poses)
    assert t_err < 2e-3, t_err
    assert rot_err < 1e-3
    assert float(cost) < 1.0
    assert np.array(inlier).mean() > 0.99


def test_ba_stereo_and_gauge(rng):
    gt_poses, lms, obs = synth_ba_problem(rng, stereo=True)
    poses0, lms0, fixed = perturb(rng, gt_poses, lms, fix_first=1)
    new_poses, new_lms, inlier, cost = ba_solve(
        jnp.asarray(poses0), jnp.asarray(fixed), jnp.asarray(lms0),
        **obs, robust_th=5.9915, iters=10)
    # stereo fixes scale with a single gauge KF
    rot_err, t_err = pose_errors(np.array(new_poses), gt_poses)
    assert t_err < 2e-3
    # fixed KF must not move
    np.testing.assert_allclose(np.array(new_poses)[0], gt_poses[0], atol=1e-6)


def test_ba_robust_to_outliers(rng):
    gt_poses, lms, obs = synth_ba_problem(rng, stereo=False, noise_px=0.3)
    poses0, lms0, fixed = perturb(rng, gt_poses, lms)
    # corrupt 10% of observations with gross errors
    O = int(obs["obs_valid"].shape[0])
    px = np.array(obs["obs_px"])
    bad = rng.choice(O, O // 10, replace=False)
    px[bad] += rng.uniform(20, 80, (len(bad), 2)) * rng.choice([-1, 1], (len(bad), 2))
    obs["obs_px"] = jnp.asarray(px)

    new_poses, new_lms, inlier, cost = ba_solve_two_pass(
        jnp.asarray(poses0), jnp.asarray(fixed), jnp.asarray(lms0),
        **obs, robust_th=5.9915, iters_robust=6, iters_l2=4)
    rot_err, t_err = pose_errors(np.array(new_poses), gt_poses)
    assert t_err < 0.02, t_err
    inlier = np.array(inlier)
    assert inlier[bad].mean() < 0.1          # outliers rejected
    mask = np.ones(O, bool); mask[bad] = False
    assert inlier[mask].mean() > 0.9         # inliers kept


def test_ba_padding_safe(rng):
    """Padded observation rows must not affect the solution."""
    gt_poses, lms, obs = synth_ba_problem(rng, n_kf=4, n_lm=60)
    poses0, lms0, fixed = perturb(rng, gt_poses, lms)
    O = int(obs["obs_valid"].shape[0])
    pad = 256
    obs_p = dict(
        obs_kf=jnp.concatenate([obs["obs_kf"], jnp.full(pad, -1, jnp.int32)]),
        obs_lm=jnp.concatenate([obs["obs_lm"], jnp.full(pad, -1, jnp.int32)]),
        obs_px=jnp.concatenate([obs["obs_px"], jnp.zeros((pad, 2), jnp.float32)]),
        obs_cam=jnp.concatenate([obs["obs_cam"], jnp.zeros(pad, jnp.int8)]),
        obs_valid=jnp.concatenate([obs["obs_valid"], jnp.zeros(pad, bool)]),
        params=obs["params"])
    a = ba_solve(jnp.asarray(poses0), jnp.asarray(fixed), jnp.asarray(lms0),
                 **obs, iters=5)
    b = ba_solve(jnp.asarray(poses0), jnp.asarray(fixed), jnp.asarray(lms0),
                 **obs_p, iters=5)
    np.testing.assert_allclose(np.array(a[0]), np.array(b[0]), atol=1e-5)


# ----------------------------------------------------------------- PnP #

def test_pnp_refine_converges(rng):
    T_gt = np.concatenate([lie_np.so3_exp([0.1, -0.05, 0.2]),
                           [0.5, -0.2, 0.3]]).astype(np.float32)
    pts_c = rng.uniform([-1.5, -1.5, 2], [1.5, 1.5, 10], (200, 3))
    Pw = lie_np.pose_apply(T_gt.astype(np.float64), pts_c).astype(np.float32)
    px = np.stack([FX * pts_c[:, 0] / pts_c[:, 2] + CX,
                   FY * pts_c[:, 1] / pts_c[:, 2] + CY], -1).astype(np.float32)
    xi = rng.normal(0, 0.05, 6)
    T0 = lie_np.pose_compose(
        np.concatenate([lie_np.so3_exp(xi[3:]), xi[:3]]),
        T_gt.astype(np.float64)).astype(np.float32)

    T, inlier, cost = pnp_refine(
        jnp.asarray(T0), jnp.asarray(Pw), jnp.asarray(px),
        jnp.ones(200, bool), FX, FY, CX, CY, iters=10)
    rot, tr = lie_np.pose_distance(np.array(T, np.float64), T_gt.astype(np.float64))
    assert tr < 1e-4 and rot < 1e-4
    assert float(cost) < 1e-4


def test_pnp_two_pass_with_outliers(rng):
    T_gt = np.concatenate([lie_np.so3_exp([0.0, 0.1, -0.1]),
                           [1.0, 0.0, -0.5]]).astype(np.float32)
    pts_c = rng.uniform([-1.5, -1.5, 2], [1.5, 1.5, 10], (300, 3))
    Pw = lie_np.pose_apply(T_gt.astype(np.float64), pts_c).astype(np.float32)
    px = np.stack([FX * pts_c[:, 0] / pts_c[:, 2] + CX,
                   FY * pts_c[:, 1] / pts_c[:, 2] + CY], -1)
    px += rng.normal(0, 0.3, px.shape)
    bad = rng.choice(300, 60, replace=False)
    px[bad] += rng.uniform(15, 60, (60, 2)) * rng.choice([-1, 1], (60, 2))

    xi = rng.normal(0, 0.03, 6)
    T0 = lie_np.pose_compose(
        np.concatenate([lie_np.so3_exp(xi[3:]), xi[:3]]),
        T_gt.astype(np.float64)).astype(np.float32)
    T, inlier, _ = pnp_refine_two_pass(
        jnp.asarray(T0), jnp.asarray(Pw), jnp.asarray(px.astype(np.float32)),
        jnp.ones(300, bool), FX, FY, CX, CY)
    rot, tr = lie_np.pose_distance(np.array(T, np.float64),
                                   T_gt.astype(np.float64))
    assert tr < 5e-3 and rot < 2e-3
    assert np.array(inlier)[bad].mean() < 0.1
