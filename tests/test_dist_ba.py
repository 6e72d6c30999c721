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


def test_balanced_sharding_bounds_padding_under_skew(rng):
    """Skewed covisibility (a few hub landmarks with many observations,
    a long tail with few) must not blow up shard padding: the balanced
    LPT assignment keeps wasted rows <= 15% (round-1 verdict: contiguous
    blocks padded every shard to the densest)."""
    from ov2slam_tpu.parallel.dist_ba import shard_padding_overhead

    n_kf, n_lm = 16, 512
    # hub landmarks: first 32 observed by every KF; the rest by 1-3 KFs
    rows = []
    for l in range(32):
        for k in range(n_kf):
            rows.append((k, l))
    for l in range(32, n_lm):
        for k in rng.choice(n_kf, int(rng.integers(1, 4)), replace=False):
            rows.append((int(k), l))
    O = len(rows)
    prob = BAProblem(
        kf_ids=np.arange(n_kf, dtype=np.int32),
        kf_poses=np.tile(np.array([1, 0, 0, 0, 0, 0, 0], np.float32),
                         (n_kf, 1)),
        kf_fixed=np.zeros(n_kf, bool),
        lm_ids=np.arange(n_lm, dtype=np.int32),
        lm_pos=np.zeros((n_lm, 3), np.float32),
        obs_kf=np.array([r[0] for r in rows], np.int32),
        obs_lm=np.array([r[1] for r in rows], np.int32),
        obs_px=np.zeros((O, 2), np.float32),
        obs_cam=np.zeros(O, np.int8),
        obs_valid=np.ones(O, bool),
    )
    shard = shard_ba_problem(prob, 8)
    overhead = shard_padding_overhead(shard)
    assert overhead <= 0.15, f"padding overhead {overhead:.1%}"
    # no observation lost
    assert shard["obs_valid"].sum() == O


def test_distributed_on_realistic_mapstore_window(rng):
    """25+ KF covisibility-sparse stereo window built through the actual
    MapStore (round-1 verdict #4): the sharded solve must improve pose
    error and match the single-device CG/dense solver's cost."""
    from ov2slam_tpu.parallel.problems import realistic_window_problem

    _, prob, params, gt_poses = realistic_window_problem(
        n_kf=28, n_lm=6000, seed=3)
    assert int(prob.obs_valid.sum()) > 10_000

    mesh = make_mesh()
    new_poses, new_lms, cost = distributed_ba_solve(
        mesh, prob, params, robust_th=5.9915, iters=6)

    live = prob.kf_ids >= 0
    _, t0 = lie_np.pose_distance(prob.kf_poses[live].astype(np.float64),
                                 gt_poses[: live.sum()].astype(np.float64))
    _, t1 = lie_np.pose_distance(new_poses[live].astype(np.float64),
                                 gt_poses[: live.sum()].astype(np.float64))
    assert float(np.mean(t1)) < 0.35 * float(np.mean(t0))

    s_poses, _, _, s_cost = ba_solve(
        jnp.asarray(prob.kf_poses), jnp.asarray(prob.kf_fixed),
        jnp.asarray(prob.lm_pos),
        jnp.asarray(prob.obs_kf), jnp.asarray(prob.obs_lm),
        jnp.asarray(prob.obs_px), jnp.asarray(prob.obs_cam),
        jnp.asarray(prob.obs_valid), params, robust_th=5.9915, iters=6)
    assert cost < 1.05 * float(s_cost)
