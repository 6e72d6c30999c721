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


@pytest.mark.slow
def test_async_paced_arrival_bench_conditions():
    """Online accuracy at BENCH conditions (round-4 verdict #10): 752x480
    stereo + full photometric realism + paced arrival with force_realtime
    dropping — the protocol `bench.py`'s e2e_async20/40 stages run on TPU
    (`rosbag play -r 1.0` analogue, reference `ov2slam.cpp:292-299`).

    CI runs on CPU where absolute throughput is ~20x lower than the TPU,
    so a fixed 20 fps pace would just measure the host. Instead the pace
    is set to 75% of the measured flat-out rate: the arrival scheduler,
    input-side load shedding and backpressure_wait_s semantics are
    exercised identically, and the accuracy gate is hardware-independent.
    On TPU this paces at ~30 fps."""
    import time as _t

    from ov2slam_tpu.io.synthetic import DEFAULT_REALISM, stream_sequence
    from ov2slam_tpu.utils.profiles import apply_profile

    n_frames = 110
    seq = stream_sequence(n_frames=n_frames, stereo=True, width=752,
                          height=480, n_points=8000, seed=0, kind="arc",
                          speed=0.05, realism=DEFAULT_REALISM)
    frames = list(seq)
    cfg = seq.make_config()
    apply_profile(cfg, "fast")
    cfg.pipelined_frontend = True
    cfg.pipeline_depth = 2
    cfg.validate()
    slam = AsyncSlamManager(cfg)
    try:
        # warm compile caches + measure the flat-out steady rate
        n_warm = 30
        walls = []
        for left, right, t in frames[:n_warm]:
            t0 = _t.perf_counter()
            slam.process_frame(left, right, t)
            walls.append(_t.perf_counter() - t0)
        med = float(np.median(walls[10:]))
        pace_fps = 0.75 / max(med, 1e-6)
        interval = 1.0 / pace_fps
        cfg.backpressure_wait_s = 2.0 * interval

        n_dropped = 0
        t_all0 = _t.perf_counter()
        i = n_warm
        while i < len(frames):
            t_sched = t_all0 + (i - n_warm) * interval
            now = _t.perf_counter()
            if now < t_sched:
                _t.sleep(t_sched - now)
            elif now > t_sched + interval and i < len(frames) - 1:
                n_behind = min(int((now - t_sched) / interval),
                               len(frames) - 1 - i)
                i += n_behind
                n_dropped += n_behind
            left, right, t = frames[i]
            slam.process_frame(left, right, t)
            i += 1
        slam.flush()
        assert getattr(slam, "n_worker_errors", 0) == 0
        times, poses = slam.estimated_trajectory()
        gt_t = np.asarray(seq.times)
        gt = np.asarray(seq.gt_poses)
        idx = np.clip(np.searchsorted(gt_t, times), 0, len(gt) - 1)
        ate = ate_rmse(poses, gt[idx], align_scale=False)
        n_proc = len(times)
        # <=10% drops at 75% pacing, and online ATE parity with the sync
        # path (sync on this sequence is ~0.013-0.015 m; 0.05 m = the
        # round-4 ask's gate)
        assert n_dropped <= 0.10 * (n_frames - n_warm), \
            f"dropped {n_dropped}/{n_frames - n_warm} at 75% pacing"
        assert ate < 0.05, \
            f"paced async ATE {ate:.3f} m ({n_proc} frames, " \
            f"{n_dropped} dropped, pace {pace_fps:.1f} fps)"
    finally:
        slam.close()
