"""Distributed BA on a virtual 8-device CPU mesh: must match the
single-device solver and converge to ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ov2slam_tpu.mapping.store import BAProblem
from ov2slam_tpu.parallel.dist_ba import (
    distributed_ba_solve, make_mesh, shard_ba_problem,
)
from ov2slam_tpu.solvers.ba import ba_solve
from ov2slam_tpu.utils import lie_np

from test_solvers import perturb, pose_errors, synth_ba_problem


def to_problem(gt_poses, lms, obs, poses0, lms0, fixed) -> BAProblem:
    O = int(obs["obs_valid"].shape[0])
    return BAProblem(
        kf_ids=np.arange(len(poses0), dtype=np.int32),
        kf_poses=poses0.astype(np.float32),
        kf_fixed=fixed,
        lm_ids=np.arange(len(lms0), dtype=np.int32),
        lm_pos=lms0.astype(np.float32),
        obs_kf=np.array(obs["obs_kf"]),
        obs_lm=np.array(obs["obs_lm"]),
        obs_px=np.array(obs["obs_px"]),
        obs_cam=np.array(obs["obs_cam"]),
        obs_valid=np.array(obs["obs_valid"]),
    )


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert len(mesh.devices.flat) == 8


def test_distributed_matches_ground_truth(rng):
    gt_poses, lms, obs = synth_ba_problem(rng, n_kf=6, n_lm=160)
    poses0, lms0, fixed = perturb(rng, gt_poses, lms)
    prob = to_problem(gt_poses, lms, obs, poses0, lms0, fixed)

    mesh = make_mesh()
    new_poses, new_lms, cost = distributed_ba_solve(
        mesh, prob, obs["params"], robust_th=5.9915, iters=10)

    rot_err, t_err = pose_errors(new_poses, gt_poses)
    assert t_err < 2e-3, t_err
    assert rot_err < 1e-3
    # landmarks recovered too
    med = np.median(np.linalg.norm(new_lms - lms, axis=-1))
    assert med < 5e-3


def test_distributed_matches_single_device(rng):
    gt_poses, lms, obs = synth_ba_problem(rng, n_kf=5, n_lm=100)
    poses0, lms0, fixed = perturb(rng, gt_poses, lms)
    prob = to_problem(gt_poses, lms, obs, poses0, lms0, fixed)

    mesh = make_mesh()
    d_poses, d_lms, _ = distributed_ba_solve(
        mesh, prob, obs["params"], robust_th=5.9915, iters=5)

    s_poses, s_lms, _, _ = ba_solve(
        jnp.asarray(prob.kf_poses), jnp.asarray(prob.kf_fixed),
        jnp.asarray(prob.lm_pos),
        jnp.asarray(prob.obs_kf), jnp.asarray(prob.obs_lm),
        jnp.asarray(prob.obs_px), jnp.asarray(prob.obs_cam),
        jnp.asarray(prob.obs_valid), obs["params"],
        robust_th=5.9915, iters=5)

    # same math, different reduction order: agree to f32 tolerance
    rot, tr = lie_np.pose_distance(d_poses.astype(np.float64),
                                   np.array(s_poses, np.float64))
    assert np.max(tr) < 5e-4
    assert np.max(rot) < 5e-4


def test_shard_partition_covers_all(rng):
    gt_poses, lms, obs = synth_ba_problem(rng, n_kf=4, n_lm=64)
    poses0, lms0, fixed = perturb(rng, gt_poses, lms)
    prob = to_problem(gt_poses, lms, obs, poses0, lms0, fixed)
    shard = shard_ba_problem(prob, 8)
    # every valid obs appears exactly once
    assert shard["obs_valid"].sum() == prob.obs_valid.sum()
    # each obs lives on the shard of its landmark block
    per = shard["lm_ids"].shape[1]
    for s in range(8):
        ok = shard["obs_valid"][s]
        assert (shard["obs_lm"][s][ok] < per).all()
        assert (shard["obs_lm"][s][ok] >= 0).all()
