"""Tests for the synthetic sequence generator — the validation tier that
stands in for the reference's EuRoC replay (`benchmark_scripts/
euroc_bench.sh`): trajectory families, photometric realism, and the
streaming renderer for long sequences."""

import numpy as np
import pytest

from ov2slam_tpu.io.synthetic import (DEFAULT_REALISM, RealismParams,
                                      SyntheticStream, generate_sequence,
                                      make_trajectory, stream_sequence)

KINDS = ["arc", "forward", "loop", "revisit", "revisit_y", "lawnmower"]


@pytest.mark.parametrize("kind", KINDS)
def test_trajectory_continuity(kind):
    """All trajectory families must be arc-length parameterized (constant
    speed) and rotation-continuous — discontinuities would teleport the
    camera and break KLT tracking by construction, not by algorithm."""
    speed = 0.05
    gt = make_trajectory(240, kind=kind, speed=speed)
    steps = np.linalg.norm(np.diff(gt[:, 4:7], axis=0), axis=1)
    assert steps.max() < 2.5 * speed, f"{kind}: position jump {steps.max()}"
    dq = np.linalg.norm(np.diff(gt[:, :4], axis=0), axis=1)
    assert dq.max() < 0.12, f"{kind}: quaternion jump {dq.max()}"
    # unit quaternions throughout
    qn = np.linalg.norm(gt[:, :4], axis=1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-9)


def test_revisit_actually_revisits():
    """The second lap of 'revisit' must pass within a small distance of
    first-lap viewpoints (that's the property loop-closure tests rely on)."""
    gt = make_trajectory(200, kind="revisit", speed=0.05)
    first, second = gt[:100, 4:7], gt[100:, 4:7]
    d = np.linalg.norm(first[:, None] - second[None], axis=-1)
    assert d.min(axis=1).max() < 0.2  # every 1st-lap pose has a 2nd-lap twin


def test_lawnmower_rows_counter_directed():
    """Adjacent lawnmower rows must run in opposite headings (that's the
    covisibility structure the pattern exists to create)."""
    gt = make_trajectory(400, kind="lawnmower", speed=0.05)
    vel = np.diff(gt[:, 4:7], axis=0)
    vz = vel[:, 2]
    # both +z and -z travel present, in large contiguous runs
    assert (vz > 0.03).sum() > 80 and (vz < -0.03).sum() > 80


def test_realism_changes_pixels_deterministically():
    kw = dict(n_frames=3, stereo=True, width=320, height=200, n_points=600,
              seed=3)
    clean = generate_sequence(**kw)
    rp = RealismParams(noise_std=2.0, exposure_amp=0.2, bias_amp=4.0,
                       vignette=0.35, n_occluders=3)
    noisy1 = generate_sequence(realism=rp, **kw)
    noisy2 = generate_sequence(realism=rp, **kw)
    d = np.abs(noisy1.images_left[1] - clean.images_left[1]).mean()
    assert d > 0.5, "realism had no visible effect"
    for i in range(3):  # deterministic per (seed, frame)
        np.testing.assert_array_equal(noisy1.images_left[i],
                                      noisy2.images_left[i])
        np.testing.assert_array_equal(noisy1.images_right[i],
                                      noisy2.images_right[i])
    # per-frame noise differs frame to frame
    assert not np.array_equal(noisy1.images_left[0], noisy1.images_left[1])


def test_occluders_paint_foreground():
    """With occluders on, some pixels must be overwritten by disc texture
    (not just global photometric scaling)."""
    kw = dict(n_frames=2, stereo=False, width=320, height=200, n_points=600,
              seed=5)
    clean = generate_sequence(**kw)
    rp = RealismParams(n_occluders=4, occluder_radius=0.45, seed=5)
    occ = generate_sequence(realism=rp, **kw)
    changed = (np.abs(occ.images_left[0] - clean.images_left[0]) > 10).mean()
    assert 0.001 < changed < 0.45, changed


def test_stream_matches_eager():
    kw = dict(n_frames=4, stereo=True, width=320, height=200, n_points=600,
              seed=7, kind="loop", realism=DEFAULT_REALISM)
    eager = generate_sequence(**kw)
    stream = stream_sequence(**kw)
    assert isinstance(stream, SyntheticStream)
    assert len(stream) == 4
    for i, (left, right, t) in enumerate(stream):
        np.testing.assert_array_equal(left, eager.images_left[i])
        np.testing.assert_array_equal(right, eager.images_right[i])
        assert t == float(eager.times[i])
    np.testing.assert_array_equal(stream.gt_poses, eager.gt_poses)
    cfg = stream.make_config()
    assert cfg.stereo and cfg.cam_right is not None


def test_stream_through_runner():
    """A SyntheticStream drives run_sequence end-to-end (the long-sequence
    validation path of `run_slam.py --synthetic`), and ATE against its own
    ground truth stays sub-centimeter on a clean short arc."""
    from ov2slam_tpu.io.runner import run_sequence

    stream = stream_sequence(n_frames=24, stereo=True, width=376,
                             height=240, n_points=3000, seed=0, kind="arc",
                             speed=0.05, realism=None)
    cfg = stream.make_config()
    res = run_sequence(cfg, stream)
    assert res.n_processed == 24
    assert res.ate is not None and res.ate < 0.05
