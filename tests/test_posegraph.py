import jax.numpy as jnp
import numpy as np

from ov2slam_tpu.solvers.posegraph import build_chain_edges, pose_graph_solve
from ov2slam_tpu.utils import lie_np


def make_loop_trajectory(n=40, r=3.0):
    poses = []
    for i in range(n):
        a = 2 * np.pi * i / n
        t = np.array([r * np.sin(a), 0.0, r * (1 - np.cos(a))])
        q = lie_np.so3_exp(np.array([0.0, a, 0.0]))
        poses.append(np.concatenate([q, t]))
    return np.stack(poses).astype(np.float32)


def test_posegraph_corrects_drift(rng):
    """Classic loop-closure scenario: odometry drift accumulates along a
    loop; the loop edge (first↔last, true relative pose) pulls it closed
    (localPoseGraph, optimizer.cpp:2346-2591)."""
    gt = make_loop_trajectory(40)

    # integrate odometry with a small bias → drift
    drift = np.concatenate([lie_np.so3_exp([0.0, 0.004, 0.0]),
                            [0.004, 0.0, 0.002]])
    est = [gt[0]]
    for i in range(1, 40):
        rel = lie_np.pose_relative(gt[i - 1], gt[i])
        rel_d = lie_np.pose_compose(rel, drift)
        est.append(lie_np.pose_compose(est[-1], rel_d))
    est = np.stack(est).astype(np.float32)

    drift_before = np.linalg.norm(est[-1][4:] - gt[-1][4:])
    assert drift_before > 0.15  # sanity: there is real drift

    # edges: odometry chain (measured from drifted estimates) + loop edge
    # with the TRUE relative pose between KF0 and KF39
    ei, ej, eT, ew = build_chain_edges(
        est, list(range(40)), loop_i=0, loop_j=39,
        T_loop=lie_np.pose_relative(gt[0], gt[39]), loop_weight=20.0)

    fixed = np.zeros(40, bool)
    fixed[0] = True
    new_poses, cost = pose_graph_solve(
        jnp.asarray(est), jnp.asarray(fixed),
        jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(eT), jnp.asarray(ew),
        iters=15)
    new_poses = np.array(new_poses)

    # loop closed: last KF near its ground-truth-relative position
    rel_err = lie_np.pose_relative(
        lie_np.pose_relative(new_poses[0].astype(np.float64),
                             new_poses[39].astype(np.float64)),
        lie_np.pose_relative(gt[0].astype(np.float64),
                             gt[39].astype(np.float64)))
    assert np.linalg.norm(rel_err[4:]) < 0.01
    # overall trajectory closer to gt than before
    err_after = np.linalg.norm(new_poses[:, 4:] - gt[:, 4:], axis=1).mean()
    err_before = np.linalg.norm(est[:, 4:] - gt[:, 4:], axis=1).mean()
    assert err_after < 0.5 * err_before


def test_posegraph_identity_stable(rng):
    gt = make_loop_trajectory(20)
    ei, ej, eT, ew = build_chain_edges(gt, list(range(20)))
    fixed = np.zeros(20, bool)
    fixed[0] = True
    new_poses, cost = pose_graph_solve(
        jnp.asarray(gt), jnp.asarray(fixed),
        jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(eT), jnp.asarray(ew),
        iters=5)
    np.testing.assert_allclose(np.array(new_poses), gt, atol=1e-4)
    assert float(cost) < 1e-8


def test_posegraph_padding_safe(rng):
    gt = make_loop_trajectory(20)
    ei, ej, eT, ew = build_chain_edges(gt, list(range(20)))
    pad = 8
    ei_p = np.concatenate([ei, np.full(pad, -1, np.int32)])
    ej_p = np.concatenate([ej, np.full(pad, -1, np.int32)])
    eT_p = np.concatenate([eT, np.tile(np.array(
        [1, 0, 0, 0, 0, 0, 0], np.float32), (pad, 1))])
    ew_p = np.concatenate([ew, np.zeros(pad, np.float32)])
    fixed = np.zeros(20, bool)
    fixed[0] = True
    a, _ = pose_graph_solve(jnp.asarray(gt), jnp.asarray(fixed),
                            jnp.asarray(ei), jnp.asarray(ej),
                            jnp.asarray(eT), jnp.asarray(ew), iters=3)
    b, _ = pose_graph_solve(jnp.asarray(gt), jnp.asarray(fixed),
                            jnp.asarray(ei_p), jnp.asarray(ej_p),
                            jnp.asarray(eT_p), jnp.asarray(ew_p), iters=3)
    np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-5)


def test_full_pose_graph_distributes_correction(rng):
    """fullPoseGraph equivalent (`optimizer.cpp:2783-2865`): KF poses are
    corrected to ground truth; interior frames should be pulled smoothly
    toward GT — strictly better than rigidly attaching each frame to its
    keyframe."""
    from ov2slam_tpu.solvers.posegraph import full_pose_graph

    gt = make_loop_trajectory(41).astype(np.float64)
    F = len(gt)
    # odometry with bias -> drifted trajectory
    drift = np.concatenate([lie_np.so3_exp([0.0, 0.003, 0.0]),
                            [0.003, 0.0, 0.001]])
    est = [gt[0]]
    for i in range(1, F):
        rel = lie_np.pose_compose(lie_np.pose_relative(gt[i - 1], gt[i]),
                                  drift)
        est.append(lie_np.pose_compose(est[-1], rel))
    est = np.stack(est)

    is_kf = np.zeros(F, bool)
    is_kf[::8] = True
    # init = rigid replay: each frame attached to the previous KF's
    # corrected (GT) pose by its estimated relative motion
    init = est.copy()
    last_kf = 0
    for i in range(F):
        if is_kf[i]:
            init[i] = gt[i]
            last_kf = i
        else:
            rel = lie_np.pose_relative(est[last_kf], est[i])
            init[i] = lie_np.pose_compose(gt[last_kf], rel)

    opt = full_pose_graph(init, est, is_kf, iters=15)

    # KFs untouched
    assert np.allclose(opt[is_kf], gt[is_kf], atol=1e-9)
    err_init = np.linalg.norm(init[~is_kf, 4:7] - gt[~is_kf, 4:7], axis=1)
    err_opt = np.linalg.norm(opt[~is_kf, 4:7] - gt[~is_kf, 4:7], axis=1)
    assert err_opt.mean() < 0.7 * err_init.mean(), (
        err_init.mean(), err_opt.mean())
    # quaternions stay normalized
    assert np.allclose(np.linalg.norm(opt[:, :4], axis=1), 1.0, atol=1e-6)


def test_full_pose_graph_edge_cases():
    from ov2slam_tpu.solvers.posegraph import full_pose_graph

    gt = make_loop_trajectory(6).astype(np.float64)
    # no keyframes -> unchanged
    out = full_pose_graph(gt, gt, np.zeros(6, bool))
    assert np.allclose(out, gt)
    # all keyframes -> unchanged
    out = full_pose_graph(gt, gt, np.ones(6, bool))
    assert np.allclose(out, gt)
    # single KF in the middle: leading/trailing segments anchored one-side
    is_kf = np.zeros(6, bool)
    is_kf[3] = True
    out = full_pose_graph(gt, gt, is_kf, iters=3)
    # consistent measurements + consistent init => stays at init
    assert np.abs(out[:, 4:7] - gt[:, 4:7]).max() < 1e-3
