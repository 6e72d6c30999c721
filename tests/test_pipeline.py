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


@pytest.mark.slow
def test_async_stress_backlog_and_fold():
    """Async hardening (round-1 verdict #9): forced backlog (tiny queue +
    randomized artificial worker delays) over a long sequence with tight
    capacities — no worker errors, no capacity violations, skipped KFs
    folded into the BA window, bounded ATE."""
    import time as _t

    seq = generate_sequence(n_frames=120, stereo=True, width=376,
                            height=240, n_points=3000, seed=8, speed=0.06)
    cfg = seq.make_config(max_keyframes=24, max_landmarks=4096,
                          use_fast=False, use_singlescale_detector=True,
                          max_dist=30)
    cfg.kf_filtering_ratio = 0.7   # culling active → recycling under async
    slam = AsyncSlamManager(cfg, queue_size=2)

    folded = []
    orig_ba = slam.estimator.local_ba

    def spy_ba(kfid, lock=None, extra_window=()):
        folded.extend(int(k) for k in extra_window)
        return orig_ba(kfid, lock=lock, extra_window=extra_window)

    slam.estimator.local_ba = spy_ba

    # randomized worker delay: stall mapping so keyframes pile up
    rng = np.random.default_rng(0)
    orig_pk = slam.mapper.process_keyframe

    def slow_pk(*a, **kw):
        _t.sleep(float(rng.uniform(0.0, 0.08)))
        return orig_pk(*a, **kw)

    slam.mapper.process_keyframe = slow_pk

    try:
        for i in range(len(seq.times)):
            slam.process_frame(seq.images_left[i], seq.images_right[i],
                               float(seq.times[i]))
        slam.flush()
        assert getattr(slam, "n_worker_errors", 0) == 0
        assert slam.map.n_keyframes >= 2
        # consistency: every valid KF's observations point at valid
        # landmarks whose observer lists point back
        m = slam.map
        with slam.map_lock:
            for k in np.nonzero(m.kf_valid)[0]:
                lm = m.obs_lmid[k]
                for slot in np.nonzero(lm >= 0)[0]:
                    l = int(lm[slot])
                    assert m.lm_valid[l], (k, slot, l)
                    assert (m.lm_obs_kf[l] == k).any(), (k, l)
        times, poses = slam.estimated_trajectory()
        ate = ate_rmse(poses, seq.gt_poses, align_scale=False)
        # robustness bound, not an accuracy gate: with genuinely
        # concurrent stages (worker never blocks the front-end), the
        # injected 0-80 ms mapping stalls leave stretches of frames
        # tracked against a not-yet-triangulated map — measured 0.19-0.36
        # m across timing seeds. Accuracy parity is gated by
        # test_async_stereo_slam (un-stalled) and the paced e2e bench;
        # this test guards consistency + fold mechanics under overload.
        assert ate < 0.45, f"stressed async ATE {ate:.3f} m"
    finally:
        slam.close()
    # under this much induced delay the queue must have backlogged at
    # least once, exercising the fold path
    assert len(folded) >= 1, "backlog never happened — stress ineffective"
