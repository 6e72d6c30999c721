"""Async pipeline: same accuracy contract as the synchronous manager."""

import numpy as np
import pytest

from ov2slam_tpu.io.synthetic import generate_sequence
from ov2slam_tpu.models.pipeline import AsyncSlamManager
from ov2slam_tpu.utils.evaluation import ate_rmse


@pytest.mark.slow
def test_async_stereo_slam():
    seq = generate_sequence(n_frames=40, stereo=True, width=376, height=240,
                            n_points=3000, seed=3, speed=0.06)
    cfg = seq.make_config(max_keyframes=64, max_landmarks=8192,
                          use_fast=False, use_singlescale_detector=True,
                          max_dist=30)
    slam = AsyncSlamManager(cfg)
    try:
        for i in range(len(seq.times)):
            slam.process_frame(seq.images_left[i], seq.images_right[i],
                               float(seq.times[i]))
        slam.flush()
        times, poses = slam.estimated_trajectory()
        assert slam.map.n_keyframes >= 2
        assert getattr(slam, "n_worker_errors", 0) == 0
        ate = ate_rmse(poses, seq.gt_poses, align_scale=False)
        # async scheduling is timing-nondeterministic (BA write-back lag,
        # backpressure skips — measured 0.01-0.08 m across runs); this is
        # a robustness gate, accuracy parity is the sync test's job
        assert ate < 0.15, f"async stereo ATE {ate:.3f} m"
    finally:
        slam.close()
