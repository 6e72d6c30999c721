"""Map-preserving relocalization after tracking loss.

Beyond-reference capability (the reference resets and discards state on
tracking failure, `ov2slam.cpp:428-455`): the lost frame is re-localized
against the map through the place-recognition index + P3P/PnP, and the
front-end resumes tracking the old landmarks.
"""

import numpy as np
import pytest

from ov2slam_tpu.io.synthetic import generate_sequence
from ov2slam_tpu.models.slam import SlamManager
from ov2slam_tpu.utils import lie_np


def _run_prefix(sm, seq, n):
    for i in range(n):
        sm.process_frame(seq.images_left[i], seq.images_right[i],
                         time=float(seq.times[i]))


@pytest.fixture(scope="module")
def reloc_setup():
    seq = generate_sequence(n_frames=40, stereo=True, width=376, height=240,
                            n_points=2500, seed=11, speed=0.05)
    cfg = seq.make_config(use_loop_closer=True)
    sm = SlamManager(cfg)
    _run_prefix(sm, seq, 30)
    return sm, seq


def test_direct_relocalization_recovers_pose(reloc_setup):
    sm, seq = reloc_setup
    assert sm.relocalizer is not None
    assert sm.map.n_keyframes >= 2

    # simulate total tracking loss, then show the relocalizer a view it
    # has seen (frame 10)
    fe = sm.frontend
    fe.frame.valid[:] = False
    fe.frame.lmids[:] = -1
    fe.preprocess(seq.images_left[10])
    fe.frame.time = float(seq.times[10])

    ok = sm.relocalizer.try_relocalize(fe)
    assert ok
    assert sm.relocalizer.n_relocs == 1
    gt = seq.gt_poses[10].astype(np.float64)
    rot_err, tr_err = lie_np.pose_distance(
        fe.frame.T_wc.astype(np.float64), gt)
    assert tr_err < 0.05, f"translation error {tr_err}"
    assert rot_err < 0.05, f"rotation error {rot_err}"
    # frame restored with live landmark observations
    assert fe.frame.n_valid >= 10
    lm = fe.frame.lmids[fe.frame.valid]
    assert (sm.map.lm_valid[lm] & sm.map.lm_is3d[lm]).all()


def test_pipeline_relocalizes_after_blackout():
    seq = generate_sequence(n_frames=40, stereo=True, width=376, height=240,
                            n_points=2500, seed=12, speed=0.05)
    cfg = seq.make_config(use_loop_closer=True)
    sm = SlamManager(cfg)
    _run_prefix(sm, seq, 25)
    n_kfs_before = sm.map.n_keyframes
    assert n_kfs_before >= 2

    # blackout: several feature-less frames -> tracking starves, the
    # relocation window engages (no spurious bootstrap keyframes)
    blank = np.zeros((240, 376), np.float32)
    for j in range(3):
        sm.process_frame(blank, blank, time=float(seq.times[25]) + 0.01 * j)
    assert sm.map.n_keyframes == n_kfs_before

    # revisit a mapped view: the relocalizer should lock back on
    T = sm.process_frame(seq.images_left[20], seq.images_right[20],
                         time=float(seq.times[25]) + 0.05)
    assert sm.relocalizer.n_relocs >= 1
    gt = seq.gt_poses[20].astype(np.float64)
    rot_err, tr_err = lie_np.pose_distance(np.array(T, np.float64), gt)
    assert tr_err < 0.05
    assert rot_err < 0.05

    # and tracking continues normally afterwards
    for i in range(21, 30):
        T = sm.process_frame(seq.images_left[i], seq.images_right[i],
                             time=float(seq.times[25]) + 0.05 * (i - 19))
    err = np.linalg.norm(np.array(T)[4:7] - seq.gt_poses[29][4:7])
    assert err < 0.1


def test_relocalizer_off_resets():
    seq = generate_sequence(n_frames=30, stereo=True, width=376, height=240,
                            n_points=2500, seed=13, speed=0.05)
    cfg = seq.make_config(use_loop_closer=True, use_relocalizer=False)
    sm = SlamManager(cfg)
    assert sm.relocalizer is None
    _run_prefix(sm, seq, 20)
    blank = np.zeros((240, 376), np.float32)
    for j in range(2):
        sm.process_frame(blank, blank, time=float(seq.times[20]) + 0.01 * j)
    assert sm.n_resets >= 1
