"""End-to-end SLAM integration tests on synthetic ground-truthed sequences
(the golden-trajectory tier of the test pyramid; the reference only has
manual rosbag replay, `benchmark_scripts/euroc_bench.sh`)."""

import numpy as np
import pytest

from ov2slam_tpu.io.synthetic import generate_sequence
from ov2slam_tpu.models.slam import SlamManager
from ov2slam_tpu.utils.evaluation import ate_rmse


def run_slam(seq, **cfg_overrides):
    cfg = seq.make_config(max_keyframes=64, max_landmarks=8192,
                          use_fast=False, use_singlescale_detector=True,
                          max_dist=30, **cfg_overrides)
    slam = SlamManager(cfg)
    for i in range(len(seq.times)):
        slam.process_frame(
            seq.images_left[i],
            seq.images_right[i] if seq.stereo else None,
            float(seq.times[i]))
    times, poses = slam.estimated_trajectory()
    return slam, poses


@pytest.mark.slow
def test_stereo_slam_synthetic():
    seq = generate_sequence(n_frames=40, stereo=True, width=376, height=240,
                            n_points=3000, seed=3, speed=0.06)
    slam, poses = run_slam(seq)
    assert slam.map.n_keyframes >= 2
    assert slam.map.n_landmarks_3d > 50
    ate = ate_rmse(poses, seq.gt_poses, align_scale=False)
    # 2.4 m trajectory: require cm-level metric accuracy (no scale align)
    assert ate < 0.05, f"stereo ATE {ate:.3f} m"


@pytest.mark.slow
def test_mono_slam_synthetic():
    seq = generate_sequence(n_frames=50, stereo=False, width=376, height=240,
                            n_points=3000, seed=4, speed=0.08)
    slam, poses = run_slam(seq)
    assert slam.frontend.initialized, "mono init never triggered"
    # pre-init frames sit at the origin (reference behavior too); evaluate
    # the initialized segment with scale alignment (mono gauge freedom)
    move = np.nonzero(np.linalg.norm(poses[:, 4:7], axis=1) > 1e-6)[0]
    assert len(move) >= 15, "too few initialized frames"
    s = move[0]
    ate = ate_rmse(poses[s:], seq.gt_poses[s:], align_scale=True)
    assert ate < 0.08, f"mono post-init ATE {ate:.3f} m"


@pytest.mark.slow
def test_loop_closure_on_circular_trajectory():
    """Full loop-closure path: circular stereo sequence revisiting its
    start; the place index + verification cascade must fire and the pose
    graph must keep the trajectory consistent."""
    seq = generate_sequence(n_frames=160, stereo=True, width=376, height=240,
                            n_points=4000, seed=6, speed=0.06, kind="loop")
    cfg = seq.make_config(max_keyframes=128, max_landmarks=16384,
                          use_fast=False, use_singlescale_detector=True,
                          max_dist=30, use_loop_closer=True,
                          lc_recent_mask=10, lc_min_score=0.2)
    slam = SlamManager(cfg)
    for i in range(len(seq.times)):
        slam.process_frame(seq.images_left[i], seq.images_right[i],
                           float(seq.times[i]))
    times, poses = slam.estimated_trajectory()
    assert slam.loop_closer.n_closures >= 1, "loop never closed"
    assert slam.n_resets == 0
    ate = ate_rmse(poses, seq.gt_poses, align_scale=False)
    # pre-closure odometry drift on this rotation-heavy loop is ~7 cm
    # (the reference's P3P-on-failure semantics; closure snaps the end)
    assert ate < 0.09, f"loop ATE {ate:.3f} m"
    # endpoint consistency after closure: back near the start
    end_err = np.linalg.norm(poses[-1, 4:7] - seq.gt_poses[-1, 4:7])
    # ~1% of the loop span (gate loosened 5 -> 7 cm when the synthetic
    # realism tier gained independent per-view sensor noise, which costs
    # ~1 cm of stereo-matching precision at this resolution)
    assert end_err < 0.07, f"endpoint error {end_err:.3f} m"


@pytest.mark.slow
def test_stereo_slam_track_from_kf():
    """`btrack_keyframetoframe` (`kltTrackingFromKF`, `visual_front_end.
    cpp:278-442`): tracking FROM the reference keyframe's image instead
    of the previous frame. Drift must not be worse than frame-to-frame
    on the same sequence (the mode exists to REDUCE accumulation)."""
    seq = generate_sequence(n_frames=40, stereo=True, width=376, height=240,
                            n_points=3000, seed=3, speed=0.06)
    slam, poses = run_slam(seq, track_keyframetoframe=True)
    assert slam.map.n_keyframes >= 2
    ate = ate_rmse(poses, seq.gt_poses, align_scale=False)
    assert ate < 0.05, f"from-KF stereo ATE {ate:.3f} m"


@pytest.mark.slow
def test_loop_closure_chained_frontend():
    """Device-chained (pipelined_frontend) mode on the SAME rotation-heavy
    loop sequence as above: the fast path and the accurate path must be
    the same system (round-4 verdict #1 — the chained mode used to lose
    20x ATE here: 1.48-1.61 m vs the 0.09 m gate, and only the bench ever
    exercised it). Gate at 1.5x the classic-path gate."""
    seq = generate_sequence(n_frames=160, stereo=True, width=376, height=240,
                            n_points=4000, seed=6, speed=0.06, kind="loop")
    cfg = seq.make_config(max_keyframes=128, max_landmarks=16384,
                          use_fast=False, use_singlescale_detector=True,
                          max_dist=30, use_loop_closer=True,
                          lc_recent_mask=10, lc_min_score=0.2)
    cfg.pipelined_frontend = True
    cfg.pipeline_depth = 2
    slam = SlamManager(cfg)
    for i in range(len(seq.times)):
        slam.process_frame(seq.images_left[i], seq.images_right[i],
                           float(seq.times[i]))
    times, poses = slam.estimated_trajectory()
    assert slam.loop_closer.n_closures >= 1, "loop never closed (chained)"
    assert slam.n_resets == 0
    ate = ate_rmse(poses, seq.gt_poses, align_scale=False)
    assert ate < 0.10, f"chained loop ATE {ate:.3f} m"
    end_err = np.linalg.norm(poses[-1, 4:7] - seq.gt_poses[-1, 4:7])
    assert end_err < 0.08, f"chained endpoint error {end_err:.3f} m"


@pytest.mark.slow
def test_stereo_trajectory_outputs(tmp_path):
    seq = generate_sequence(n_frames=20, stereo=True, width=376, height=240,
                            n_points=2000, seed=5, speed=0.05)
    slam, poses = run_slam(seq)
    slam.write_results(str(tmp_path))
    for name in ["ov2slam_traj.txt", "ov2slam_kfs_traj.txt",
                 "ov2slam_traj_kitti.txt", "ov2slam_full_traj_wlc.txt",
                 "ov2slam_full_traj_wlc_opt.txt"]:
        assert (tmp_path / name).exists(), name
    from ov2slam_tpu.utils.trajectory import load_tum
    times, loaded = load_tum(str(tmp_path / "ov2slam_traj.txt"))
    assert len(times) == 20
