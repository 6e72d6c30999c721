import numpy as np

from ov2slam_tpu.utils import lie
from ov2slam_tpu.utils.evaluation import ate_rmse, rpe, umeyama_alignment
from ov2slam_tpu.utils.trajectory import TrajectoryLogger, load_tum


def circle_traj(n=50, r=2.0):
    poses = []
    for i in range(n):
        a = 2 * np.pi * i / n
        t = np.array([r * np.cos(a), r * np.sin(a), 0.1 * i])
        q = np.array(lie.so3_exp(np.array([0.0, 0.0, a])))
        poses.append(np.concatenate([q, t]))
    return np.stack(poses)


def test_tum_write_load_roundtrip(tmp_path):
    poses = circle_traj()
    log = TrajectoryLogger()
    for i, T in enumerate(poses):
        log.add_pose(float(i) * 0.05, T, is_keyframe=(i % 5 == 0), kf_id=i // 5)
    p = tmp_path / "traj.txt"
    log.write_tum(str(p))
    times, loaded = load_tum(str(p))
    np.testing.assert_allclose(times, np.arange(50) * 0.05, atol=1e-6)
    # quaternion sign may flip; compare rotation matrices
    np.testing.assert_allclose(
        np.array(lie.pose_to_matrix(loaded)),
        np.array(lie.pose_to_matrix(poses)), atol=1e-6)


def test_kf_replay_applies_correction(tmp_path):
    """Replaying rel-poses from corrected KF poses shifts the trajectory
    (the writeFullTrajectoryLC mechanism, ov2slam.cpp:650-695)."""
    poses = circle_traj(20)
    log = TrajectoryLogger()
    kf_poses = {}
    cur_kf = -1
    for i, T in enumerate(poses):
        if i % 4 == 0:
            cur_kf += 1
            kf_poses[cur_kf] = T
        log.add_pose(float(i), T, i % 4 == 0, cur_kf, kf_poses[cur_kf])
    # apply a rigid correction to all keyframes
    dT = np.array(lie.se3_exp(np.array([0.5, -0.2, 0.1, 0.02, 0.0, -0.01])))
    corrected = {k: np.array(lie.pose_compose(dT, v))
                 for k, v in kf_poses.items()}
    replayed = log.replay_with_keyframes(corrected)
    for i, fp in enumerate(replayed):
        expected = np.array(lie.pose_compose(dT, poses[i]))
        np.testing.assert_allclose(
            np.array(lie.pose_to_matrix(fp.T_wc)),
            np.array(lie.pose_to_matrix(expected)), atol=1e-9)


def test_umeyama_recovers_similarity(rng):
    src = rng.normal(size=(100, 3))
    R_true = np.array(lie.quat_to_matrix(lie.so3_exp(np.array([0.3, -0.2, 0.5]))))
    s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5])
    dst = (s_true * (R_true @ src.T)).T + t_true
    R, t, s = umeyama_alignment(src, dst)
    np.testing.assert_allclose(R, R_true, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)
    assert abs(s - s_true) < 1e-9


def test_ate_zero_for_similar_trajectories():
    poses = circle_traj(40)
    # scaled/rotated copy should align to ~0 ATE
    R = np.array(lie.quat_to_matrix(lie.so3_exp(np.array([0.1, 0.2, -0.3]))))
    transformed = poses.copy()
    transformed[:, 4:7] = (1.7 * (R @ poses[:, 4:7].T)).T + np.array([5, 6, 7])
    assert ate_rmse(transformed, poses) < 1e-9
    # perturbed copy has the expected error magnitude
    noisy = poses.copy()
    noisy[:, 4:7] += 0.05
    assert ate_rmse(noisy, poses, align_scale=False) < 0.06


def test_rpe_identity():
    poses = circle_traj(30)
    t_err, r_err = rpe(poses, poses)
    assert t_err < 1e-12 and r_err < 1e-12


def test_tartanair_writer(tmp_path):
    from ov2slam_tpu.utils.trajectory import TrajectoryLogger
    from ov2slam_tpu.utils import lie_np

    tl = TrajectoryLogger()
    for i in range(3):
        T = lie_np.pose_identity()
        T[4] = 0.5 * i
        tl.add_pose(0.1 * i, T, False, -1, None)
    p = tmp_path / "traj_tartanair.txt"
    tl.write_tartanair(str(p))
    rows = np.loadtxt(str(p)).reshape(-1, 7)
    assert rows.shape == (3, 7)
    np.testing.assert_allclose(rows[2, 0], 1.0)   # tx
    np.testing.assert_allclose(rows[:, 6], 1.0)   # qw last (xyzw order)
