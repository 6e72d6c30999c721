import numpy as np
import pytest

from ov2slam_tpu.io.euroc import EurocDataset, write_asl_sequence
from ov2slam_tpu.io.runner import run_sequence
from ov2slam_tpu.io.synthetic import generate_sequence


@pytest.fixture(scope="module")
def asl_dir(tmp_path_factory):
    seq = generate_sequence(n_frames=6, stereo=True, width=200, height=160,
                            n_points=800, seed=10)
    root = tmp_path_factory.mktemp("euroc")
    write_asl_sequence(seq, str(root))
    return str(root), seq


def test_euroc_reader_roundtrip(asl_dir):
    root, seq = asl_dir
    ds = EurocDataset(root)
    assert ds.stereo
    assert len(ds) == 6
    frames = list(ds)
    left0, right0, t0 = frames[0]
    assert left0.shape == (160, 200)
    assert right0.shape == (160, 200)
    assert abs(t0 - seq.times[0]) < 1e-6
    # pixel content survives the uint8 roundtrip
    assert np.abs(left0 - seq.images_left[0]).max() <= 1.0

    gt = ds.ground_truth()
    assert gt is not None
    times, poses = gt
    np.testing.assert_allclose(times, seq.times, atol=1e-6)
    np.testing.assert_allclose(poses[:, 4:], seq.gt_poses[:, 4:], atol=1e-9)


def test_euroc_reader_mono(asl_dir):
    root, _ = asl_dir
    ds = EurocDataset(root, stereo=False)
    assert not ds.stereo
    left, right, t = next(iter(ds))
    assert right is None


def test_runner_on_synthetic():
    seq = generate_sequence(n_frames=12, stereo=True, width=376, height=240,
                            n_points=2500, seed=11, speed=0.05)
    cfg = seq.make_config(max_keyframes=32, max_landmarks=4096,
                          use_fast=False, use_singlescale_detector=True,
                          max_dist=30)
    res = run_sequence(cfg, seq)
    assert res.n_processed == 12
    assert res.n_keyframes >= 1
    assert res.ate is not None and res.ate < 0.1


def test_euroc_e2e_dense_body_frame_gt(tmp_path):
    """Full --euroc semantics against a realistic GT fixture: 200 Hz GT in
    the *body* frame. The runner must associate by timestamp and apply
    body_T_cam0 — index pairing would compress time 10x (round-1 bug)."""
    from ov2slam_tpu.utils import lie_np

    seq = generate_sequence(n_frames=14, stereo=True, width=376, height=240,
                            n_points=2500, seed=13, speed=0.05)
    T_bc = lie_np.make_pose(lie_np.so3_exp([0.1, -0.2, 0.3]),
                            np.array([0.05, -0.02, 0.1]))
    root = tmp_path / "mh"
    write_asl_sequence(seq, str(root), gt_rate_hz=200.0, T_body_cam=T_bc)

    ds = EurocDataset(str(root))
    gt_times, gt_body = ds.ground_truth()
    assert len(gt_times) > 5 * len(ds)      # genuinely dense GT

    cfg = seq.make_config(max_keyframes=32, max_landmarks=4096,
                          use_fast=False, use_singlescale_detector=True,
                          max_dist=30)
    res = run_sequence(cfg, iter(ds), gt_poses=gt_body, gt_times=gt_times,
                       T_body_cam=T_bc)
    assert res.n_processed == 14
    assert res.ate is not None and res.ate < 0.1


def test_runner_realtime_drops_frames():
    seq = generate_sequence(n_frames=12, stereo=True, width=376, height=240,
                            n_points=2500, seed=12, speed=0.05,
                            fps=1e6)  # absurd rate: forces drops
    cfg = seq.make_config(max_keyframes=32, max_landmarks=4096,
                          use_fast=False, use_singlescale_detector=True,
                          max_dist=30, force_realtime=True)
    res = run_sequence(cfg, seq)
    assert res.n_dropped > 0
    assert res.n_processed + res.n_dropped == 12


# ------------------------------------------------------------- datasets #

def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr.astype("uint8")).save(path)


def test_kitti_reader(tmp_path, rng):
    import os

    seq = tmp_path / "sequences" / "07"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir()
    (tmp_path / "poses").mkdir()
    n = 4
    for i in range(n):
        img = rng.uniform(0, 255, (48, 64))
        _write_png(seq / "image_0" / f"{i:06d}.png", img)
        _write_png(seq / "image_1" / f"{i:06d}.png", img)
    (seq / "times.txt").write_text("".join(f"{0.1*i:.6f}\n" for i in range(n)))
    # gt: identity-ish 3x4 rows
    rows = []
    for i in range(n):
        M = np.hstack([np.eye(3), [[0.5 * i], [0.0], [0.0]]])
        rows.append(" ".join(f"{v:.6e}" for v in M.reshape(-1)))
    (tmp_path / "poses" / "07.txt").write_text("\n".join(rows) + "\n")

    from ov2slam_tpu.io.kitti import KittiDataset

    ds = KittiDataset(str(tmp_path), "07")
    assert len(ds) == n and ds.stereo
    frames = list(ds)
    assert frames[0][0].shape == (48, 64)
    assert frames[1][1] is not None
    assert abs(frames[2][2] - 0.2) < 1e-9
    times, poses = ds.ground_truth()
    assert poses.shape == (n, 7)
    np.testing.assert_allclose(poses[2, 4], 1.0, atol=1e-6)
    np.testing.assert_allclose(poses[0, 0], 1.0, atol=1e-6)  # identity quat


def test_tartanair_reader(tmp_path, rng):
    (tmp_path / "image_left").mkdir()
    (tmp_path / "image_right").mkdir()
    n = 3
    for i in range(n):
        img = rng.uniform(0, 255, (32, 40))
        _write_png(tmp_path / "image_left" / f"{i:06d}_left.png", img)
        _write_png(tmp_path / "image_right" / f"{i:06d}_right.png", img)
    rows = [f"{0.1*i:.6f} 0.0 0.0 0.0 0.0 0.0 1.0" for i in range(n)]
    (tmp_path / "pose_left.txt").write_text("\n".join(rows) + "\n")

    from ov2slam_tpu.io.tartanair import TartanAirDataset

    ds = TartanAirDataset(str(tmp_path))
    assert len(ds) == n and ds.stereo
    frames = list(ds)
    assert frames[0][1] is not None
    times, poses = ds.ground_truth()
    assert poses.shape == (n, 7)
    np.testing.assert_allclose(poses[:, 0], 1.0)          # qw
    np.testing.assert_allclose(poses[1, 4], 0.1, atol=1e-6)
