"""Anchored inverse-depth BA: Jacobian correctness + convergence.

Validates the TPU re-derivation of the reference's `KSE3AnchInvDepth`
parameterization (`se3left_parametrization.hpp:171-274`,
`optimizer.cpp:207-290`): analytic Jacobians vs autodiff, the
anchor-self-observation cancellation property, and convergence to the
ground truth on synthetic windows.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ov2slam_tpu.solvers.ba_invdepth import (
    _residuals_jacobians_inv,
    ba_solve_invdepth,
    ba_solve_invdepth_two_pass,
)
from ov2slam_tpu.utils import lie, lie_np

from tests.test_solvers import perturb, pose_errors, synth_ba_problem


def _invdepth_state(gt_poses, lms, obs, lm_pos_override=None):
    """Anchor each landmark to its first observing KF; ray from the
    measured pixel, rho from the (possibly perturbed) landmark depth."""
    obs_kf = np.array(obs["obs_kf"])
    obs_lm = np.array(obs["obs_lm"])
    obs_px = np.array(obs["obs_px"])
    obs_cam = np.array(obs["obs_cam"])
    n_lm = len(lms)
    anchor = np.full(n_lm, -1, np.int32)
    anchor_px = np.zeros((n_lm, 2), np.float32)
    for o in range(len(obs_kf)):
        l = obs_lm[o]
        if obs_cam[o] == 0 and anchor[l] < 0:
            anchor[l] = obs_kf[o]
            anchor_px[l] = obs_px[o]
    anchor = np.maximum(anchor, 0)

    pos = lms if lm_pos_override is None else lm_pos_override
    T_cw_a = lie_np.pose_inverse(gt_poses[anchor].astype(np.float64))
    z = np.maximum(
        lie_np.pose_apply(T_cw_a, pos.astype(np.float64))[:, 2], 1e-3)
    rho = (1.0 / z).astype(np.float32)

    p = obs["params"]
    ray = np.stack([(anchor_px[:, 0] - float(p.cx)) / float(p.fx),
                    (anchor_px[:, 1] - float(p.cy)) / float(p.fy)],
                   -1).astype(np.float32)
    return rho, anchor, ray


def test_invdepth_jacobians_vs_autodiff(rng):
    gt_poses, lms, obs = synth_ba_problem(rng, n_kf=3, n_lm=12, stereo=True)
    rho, anchor, ray = _invdepth_state(gt_poses, lms, obs)
    # perturb so residuals are non-trivial
    poses = gt_poses.copy()
    for k in range(1, len(poses)):
        xi = rng.normal(0, 0.01, 6)
        poses[k] = lie_np.pose_compose(
            np.concatenate([lie_np.so3_exp(xi[3:]), xi[:3]]),
            poses[k]).astype(np.float32)
    rho = rho * (1 + rng.normal(0, 0.05, rho.shape)).astype(np.float32)

    T_cw = lie.pose_inverse(jnp.asarray(poses))
    rho_j = jnp.asarray(rho)
    anchor_j = jnp.asarray(anchor)
    ray_j = jnp.asarray(ray)
    args = (obs["obs_kf"], obs["obs_lm"], obs["obs_px"], obs["obs_cam"])

    r0, J_obs, J_anch, J_rho, _ = _residuals_jacobians_inv(
        T_cw, rho_j, anchor_j, ray_j, *args, obs["params"])

    Kw, Lw = len(poses), len(rho)

    def res_fn(dxi, drho):
        T = lie.pose_left_update(T_cw, dxi)
        r, *_ = _residuals_jacobians_inv(
            T, rho_j + drho, anchor_j, ray_j, *args, obs["params"])
        return r

    Jp_auto, Jr_auto = jax.jacfwd(res_fn, argnums=(0, 1))(
        jnp.zeros((Kw, 6)), jnp.zeros(Lw))
    # Jp_auto: (O, 2, Kw, 6); analytic accumulates obs + anchor slots
    O = r0.shape[0]
    Jp_ana = np.zeros((O, 2, Kw, 6), np.float32)
    okf = np.array(obs["obs_kf"])
    olm = np.array(obs["obs_lm"])
    for o in range(O):
        Jp_ana[o, :, okf[o]] += np.array(J_obs[o])
        Jp_ana[o, :, anchor[olm[o]]] += np.array(J_anch[o])
    np.testing.assert_allclose(np.array(Jp_auto), Jp_ana,
                               rtol=2e-3, atol=2e-2)

    Jr_ana = np.zeros((O, 2, Lw), np.float32)
    for o in range(O):
        Jr_ana[o, :, olm[o]] = np.array(J_rho[o])
    np.testing.assert_allclose(np.array(Jr_auto), Jr_ana,
                               rtol=2e-3, atol=2e-2)


def test_invdepth_anchor_self_observation_is_pose_invariant(rng):
    """An anchor's own reprojection must have zero total pose Jacobian:
    the observer and anchor contributions cancel exactly."""
    gt_poses, lms, obs = synth_ba_problem(rng, n_kf=3, n_lm=20)
    rho, anchor, ray = _invdepth_state(gt_poses, lms, obs)
    T_cw = lie.pose_inverse(jnp.asarray(gt_poses))

    _, J_obs, J_anch, _, _ = _residuals_jacobians_inv(
        T_cw, jnp.asarray(rho), jnp.asarray(anchor), jnp.asarray(ray),
        obs["obs_kf"], obs["obs_lm"], obs["obs_px"], obs["obs_cam"],
        obs["params"])

    okf = np.array(obs["obs_kf"])
    olm = np.array(obs["obs_lm"])
    ocam = np.array(obs["obs_cam"])
    self_obs = (okf == anchor[olm]) & (ocam == 0)
    assert self_obs.sum() > 0
    total = np.array(J_obs)[self_obs] + np.array(J_anch)[self_obs]
    np.testing.assert_allclose(total, 0.0, atol=1e-4)


def test_invdepth_converges_to_ground_truth(rng):
    gt_poses, lms, obs = synth_ba_problem(rng, n_kf=6, n_lm=120, stereo=True)
    poses0, lms0, fixed = perturb(rng, gt_poses, lms, fix_first=1)
    rho, anchor, ray = _invdepth_state(poses0, lms, obs,
                                       lm_pos_override=lms0)

    out_poses, out_lms, out_rho, inlier, cost = ba_solve_invdepth(
        jnp.asarray(poses0), jnp.asarray(fixed), jnp.asarray(rho),
        jnp.asarray(anchor), jnp.asarray(ray),
        obs["obs_kf"], obs["obs_lm"], obs["obs_px"], obs["obs_cam"],
        obs["obs_valid"], obs["params"], robust_th=0.0, iters=10)

    rot_err, tr_err = pose_errors(np.array(out_poses), gt_poses)
    assert rot_err < 1e-3
    assert tr_err < 5e-3
    # landmark world positions recovered through the anchored rays
    d = np.linalg.norm(np.array(out_lms) - lms, axis=1)
    assert np.median(d) < 0.02


def test_invdepth_two_pass_rejects_outliers(rng):
    gt_poses, lms, obs = synth_ba_problem(
        rng, n_kf=6, n_lm=120, stereo=True, noise_px=0.3)
    poses0, lms0, fixed = perturb(rng, gt_poses, lms, fix_first=1)
    rho, anchor, ray = _invdepth_state(poses0, lms, obs,
                                       lm_pos_override=lms0)

    # corrupt 5% of observations
    obs_px = np.array(obs["obs_px"])
    n_bad = max(2, len(obs_px) // 20)
    bad = rng.choice(len(obs_px), n_bad, replace=False)
    obs_px[bad] += rng.uniform(30, 80, (n_bad, 2)).astype(np.float32)

    out_poses, _, _, inlier, _ = ba_solve_invdepth_two_pass(
        jnp.asarray(poses0), jnp.asarray(fixed), jnp.asarray(rho),
        jnp.asarray(anchor), jnp.asarray(ray),
        obs["obs_kf"], obs["obs_lm"], jnp.asarray(obs_px), obs["obs_cam"],
        obs["obs_valid"], obs["params"],
        robust_th=5.9915, iters_robust=6, iters_l2=4)

    rot_err, tr_err = pose_errors(np.array(out_poses), gt_poses)
    assert rot_err < 5e-3
    assert tr_err < 2e-2
    inl = np.array(inlier)
    assert (~inl[bad]).mean() > 0.8
