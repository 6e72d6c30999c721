"""ATE association correctness: timestamp pairing + body→cam extrinsic.

Round-1 verdict weak #1: EuRoC ground truth is ~200 Hz body-frame while
the estimate is 20 Hz cam0-frame; index pairing compresses time 10× and
skips the `body_T_cam0` extrinsic. These tests pin the fixed behavior on
an analytic fixture where the right answer is exactly zero.
"""

import numpy as np
import pytest

from ov2slam_tpu.utils import lie_np
from ov2slam_tpu.utils.evaluation import (ate_rmse, associate,
                                          transform_body_to_cam)


def _cam_pose(t: float) -> np.ndarray:
    """Analytic smooth camera trajectory T_w_cam(t)."""
    q = lie_np.so3_exp([0.02 * t, 0.3 * t, 0.01 * np.sin(t)])
    pos = np.array([np.cos(0.4 * t), np.sin(0.4 * t), 0.1 * t])
    return lie_np.make_pose(q, pos)


@pytest.fixture
def fixture():
    T_body_cam = lie_np.make_pose(
        lie_np.so3_exp([0.1, -0.2, 0.3]), np.array([0.05, -0.02, 0.1]))
    cam_hz, gt_hz, dur = 20.0, 200.0, 10.0
    est_times = np.arange(0, dur, 1.0 / cam_hz)
    # GT sampling is offset by a sub-frame phase (real EuRoC clocks are
    # not aligned) and starts slightly before the camera
    gt_times = np.arange(-0.1, dur + 0.1, 1.0 / gt_hz) + 0.0013
    est_poses = np.stack([_cam_pose(t) for t in est_times])
    gt_body = np.stack([
        lie_np.pose_compose(_cam_pose(t), lie_np.pose_inverse(T_body_cam))
        for t in gt_times])
    return est_times, est_poses, gt_times, gt_body, T_body_cam


def test_associate_rate_mismatch(fixture):
    est_times, _, gt_times, _, _ = fixture
    ia, ib = associate(est_times, gt_times, max_dt=0.02)
    assert len(ia) == len(est_times)          # every frame finds a GT
    # paired timestamps agree to within half a GT period
    assert np.abs(est_times[ia] - gt_times[ib]).max() <= 0.5 / 200.0 + 1e-9


def test_ate_zero_with_timestamps_and_extrinsic(fixture):
    est_times, est_poses, gt_times, gt_body, T_bc = fixture
    gt_cam = transform_body_to_cam(gt_body, T_bc)
    ate = ate_rmse(est_poses, gt_cam, est_times=est_times,
                   gt_times=gt_times, align_scale=False)
    # residual = trajectory motion over the <=2.5 ms association offset
    assert ate < 2e-3


def test_ate_index_pairing_is_wrong_on_rate_mismatch(fixture):
    """Documents the round-1 bug: index pairing vs 200 Hz GT compares
    frame k against GT sample k (~10× time compression)."""
    est_times, est_poses, gt_times, gt_body, T_bc = fixture
    gt_cam = transform_body_to_cam(gt_body, T_bc)
    n = min(len(est_poses), len(gt_cam))
    wrong = ate_rmse(est_poses[:n], gt_cam[:n], align_scale=False)
    right = ate_rmse(est_poses, gt_cam, est_times=est_times,
                     gt_times=gt_times, align_scale=False)
    assert wrong > 50 * max(right, 1e-6)


def test_extrinsic_matters(fixture):
    """Skipping body_T_cam0 leaves a rigid offset that Umeyama cannot
    absorb when the trajectory rotates."""
    est_times, est_poses, gt_times, gt_body, T_bc = fixture
    ate_with = ate_rmse(est_poses, transform_body_to_cam(gt_body, T_bc),
                        est_times=est_times, gt_times=gt_times,
                        align_scale=False)
    ate_without = ate_rmse(est_poses, gt_body, est_times=est_times,
                           gt_times=gt_times, align_scale=False)
    assert ate_without > 10 * max(ate_with, 1e-6)


def test_transform_accepts_4x4():
    T_bc7 = lie_np.make_pose(lie_np.so3_exp([0.0, 0.5, 0.0]),
                             np.array([1.0, 2.0, 3.0]))
    M = lie_np.pose_to_matrix(T_bc7)
    body = np.stack([_cam_pose(t) for t in np.linspace(0, 5, 11)])
    a = transform_body_to_cam(body, T_bc7)
    b = transform_body_to_cam(body, M)
    np.testing.assert_allclose(a, b, atol=1e-12)
