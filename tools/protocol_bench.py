#!/usr/bin/env python
"""Protocol-scale benchmark tier — the reference's EuRoC replay protocol
(`benchmark_scripts/euroc_bench.sh:3-20`: 1,800-3,700-frame sequences,
5 runs each, `rosbag play -r 1.0` real-time arrival) reproduced on
photometrically-realistic rendered sequences at full 752x480 resolution.

Each (config x sequence) cell runs N times with different render seeds
(the reference's 5 runs capture run-to-run variance the same way) in two
modes per run:

  throughput  flat-out feeding through the async manager: net frames/s
              with mapping/BA/LC overlapped — the ">= 2x reference
              real-time rate" demonstrator,
  online      frames arrive ON THE 20 fps PROTOCOL CLOCK; when
              processing falls a full frame behind, the arrival queue
              drops to the newest frame (`force_realtime`,
              `ov2slam.cpp:292-299`). ATE here is the reference's
              defining "fully online" property.

Appends one JSON line per run to ``--out`` (tools/protocol_runs.jsonl);
BENCHMARKS.md is composed from those records.

Usage:
  python tools/protocol_bench.py [--frames 1000] [--runs 5] \
      [--cells fast_arc,accurate_arc,fast_revisit] [--smoke]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


CELLS = {
    # name: (profile, kind, loop_closer, n_runs_scale)
    "fast_arc": ("fast", "arc", False),
    "average_arc": ("average", "arc", False),
    "accurate_arc": ("accurate", "arc", False),
    "fast_revisit": ("fast", "revisit_y", True),
    "fast_lawnmower": ("fast", "lawnmower", True),
}


def render(n_frames, kind, seed):
    from ov2slam_tpu.io.synthetic import DEFAULT_REALISM, stream_sequence

    t0 = time.perf_counter()
    seq = stream_sequence(
        n_frames=n_frames, stereo=True, width=752, height=480,
        n_points=12000, seed=seed, kind=kind, speed=0.05,
        realism=DEFAULT_REALISM)
    frames = list(seq)
    log(f"rendered {n_frames}f {kind} seed={seed} "
        f"({time.perf_counter() - t0:.0f}s)")
    return seq, frames


def run_once(seq, frames, profile, use_lc, pace_fps):
    from ov2slam_tpu.models.pipeline import AsyncSlamManager
    from ov2slam_tpu.utils.evaluation import ate_rmse
    from ov2slam_tpu.utils.profiles import apply_profile

    cfg = seq.make_config()
    apply_profile(cfg, profile)
    cfg.pipelined_frontend = True
    cfg.pipeline_depth = 2
    cfg.use_loop_closer = use_lc
    if pace_fps:
        cfg.backpressure_wait_s = 2.0 / pace_fps
    cfg.validate()
    mgr = AsyncSlamManager(cfg)
    try:
        n_warm = 30
        for left, right, t in frames[:n_warm]:
            mgr.process_frame(left, right, t)
        interval = 1.0 / pace_fps if pace_fps else 0.0
        n_dropped = 0
        t0 = time.perf_counter()
        i = n_warm
        n_proc = 0
        while i < len(frames):
            if pace_fps:
                t_sched = t0 + (i - n_warm) * interval
                now = time.perf_counter()
                if now < t_sched:
                    time.sleep(t_sched - now)
                elif now > t_sched + interval and i < len(frames) - 1:
                    n_behind = min(int((now - t_sched) / interval),
                                   len(frames) - 1 - i)
                    i += n_behind
                    n_dropped += n_behind
            left, right, t = frames[i]
            mgr.process_frame(left, right, t)
            n_proc += 1
            i += 1
        wall = time.perf_counter() - t0
        mgr.flush()
        est_t, est_p = mgr.estimated_trajectory()
        gt_t = np.asarray(seq.times)
        gt = np.asarray(seq.gt_poses)
        idx = np.clip(np.searchsorted(gt_t, est_t), 0, len(gt) - 1)
        ate = float(ate_rmse(est_p, gt[idx], align_scale=False))
        end_err = float(np.linalg.norm(est_p[-1, 4:7] - gt[idx[-1], 4:7]))
        span = float(np.linalg.norm(gt[1:, 4:7] - gt[:-1, 4:7],
                                    axis=1).sum())
        return dict(
            fps_net=round(n_proc / wall, 2), ate_m=round(ate, 4),
            end_err_m=round(end_err, 4), traj_len_m=round(span, 1),
            n_kf=int(mgr.map.n_keyframes),
            n_lm=int(mgr.map.n_landmarks_3d),
            n_closures=int(getattr(mgr.loop_closer, "n_closures", 0))
            if use_lc else 0,
            n_dropped=int(n_dropped), n_proc=int(n_proc),
            n_resets=int(getattr(mgr, "n_resets", 0)),
            n_worker_errors=int(getattr(mgr, "n_worker_errors", 0)),
        )
    finally:
        mgr.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--cells", default="fast_arc,accurate_arc,fast_revisit")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "protocol_runs.jsonl"))
    ap.add_argument("--smoke", action="store_true",
                    help="120 frames, 1 run, fast_arc only")
    args = ap.parse_args()
    if args.smoke:
        args.frames, args.runs, args.cells = 120, 1, "fast_arc"

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    dev = jax.devices()[0]
    log(f"backend: {dev.platform}")

    for cell in args.cells.split(","):
        profile, kind, use_lc = CELLS[cell]
        # accurate costs ~2x fast per frame; trim its run count
        n_runs = args.runs if profile == "fast" else max(
            2, (args.runs + 1) // 2)
        for r in range(n_runs):
            seq, frames = render(args.frames, kind, seed=100 + r)
            for mode, pace in (("throughput", None), ("online", 20.0)):
                t0 = time.perf_counter()
                try:
                    res = run_once(seq, frames, profile, use_lc, pace)
                except Exception as e:
                    import traceback

                    traceback.print_exc()
                    res = {"error": f"{type(e).__name__}: {e}"[:200]}
                rec = dict(cell=cell, profile=profile, kind=kind,
                           mode=mode, run=r, seed=100 + r,
                           n_frames=args.frames,
                           backend=str(dev.platform),
                           wall_s=round(time.perf_counter() - t0, 1),
                           **res)
                with open(args.out, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                log(f"{cell} run{r} {mode}: "
                    + json.dumps({k: res[k] for k in
                                  ("fps_net", "ate_m", "n_kf", "n_closures",
                                   "n_dropped")
                                  if k in res}))
            del frames, seq


if __name__ == "__main__":
    main()
