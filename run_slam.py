#!/usr/bin/env python
"""CLI entry point — the equivalent of `ov2slam_node` (`src/
ov2slam_node.cpp:159-223`) without ROS: replay a dataset (EuRoC ASL
directory or a generated synthetic sequence) through the SLAM pipeline
and write trajectory files + an ATE report.

Usage:
    python run_slam.py --euroc /data/MH_01_easy --config <yaml> \
        [--profile fast|average|accurate] [--mono] [--out results/]
    python run_slam.py --synthetic loop --frames 160 [--mono]
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--euroc", help="EuRoC ASL sequence root")
    ap.add_argument("--kitti", help="KITTI odometry root")
    ap.add_argument("--kitti-seq", default="00", help="KITTI sequence id")
    ap.add_argument("--tartanair", help="TartanAir trajectory root")
    ap.add_argument("--config", help="parameter YAML (reference format)")
    ap.add_argument("--synthetic",
                    choices=["arc", "forward", "loop", "revisit",
                             "revisit_y", "lawnmower"],
                    help="generate a synthetic sequence instead")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--realism", action="store_true",
                    help="photometric realism: sensor noise, exposure "
                         "drift, vignetting, moving occluders")
    ap.add_argument("--async", dest="use_async", action="store_true",
                    help="run mapping/BA on the async worker thread")
    ap.add_argument("--profile", choices=["fast", "average", "accurate"])
    ap.add_argument("--mono", action="store_true")
    ap.add_argument("--out", default=".")
    ap.add_argument("--timings", action="store_true")
    ap.add_argument("--trace", metavar="DIR",
                    help="capture a jax.profiler device trace into DIR")
    args = ap.parse_args()

    try:  # persistent compile cache (remote-TPU compiles are expensive)
        import jax

        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from ov2slam_tpu.io.runner import run_sequence
    from ov2slam_tpu.utils.config import SlamConfig, load_config
    from ov2slam_tpu.utils.profiles import apply_profile
    from ov2slam_tpu.utils.profiler import Profiler

    os.makedirs(args.out, exist_ok=True)

    if args.synthetic:
        from ov2slam_tpu.io.synthetic import (DEFAULT_REALISM,
                                              stream_sequence)

        # streaming render: frames are generated lazily, so 1-2k-frame
        # validation runs don't hold the whole image stack in memory
        seq = stream_sequence(
            n_frames=args.frames, stereo=not args.mono,
            kind=args.synthetic, width=752, height=480, n_points=8000,
            speed=0.05,
            realism=DEFAULT_REALISM if args.realism else None)
        cfg = seq.make_config()
        frames = seq
        gt, gt_times, T_body_cam = seq.gt_poses, None, None
    elif args.euroc or args.kitti or args.tartanair:
        cfg = (load_config(args.config) if args.config else SlamConfig())
        if args.mono:
            cfg.mono, cfg.stereo = True, False
        if args.euroc:
            from ov2slam_tpu.io.euroc import EurocDataset

            ds = EurocDataset(args.euroc, stereo=cfg.stereo)
        elif args.kitti:
            from ov2slam_tpu.io.kitti import KittiDataset

            ds = KittiDataset(args.kitti, args.kitti_seq,
                              stereo=cfg.stereo)
        else:
            from ov2slam_tpu.io.tartanair import TartanAirDataset

            ds = TartanAirDataset(args.tartanair, stereo=cfg.stereo)
        frames = iter(ds)
        gt_data = ds.ground_truth()
        gt = gt_data[1] if gt_data else None
        gt_times = gt_data[0] if gt_data else None
        # EuRoC GT is the body (IMU) frame: push through body_T_cam0
        T_body_cam = cfg.cam_left.T_body_cam if args.euroc else None
    else:
        ap.error("need --euroc, --kitti, --tartanair or --synthetic")

    if args.profile:
        apply_profile(cfg, args.profile)
    cfg.validate()

    slam = None
    if args.use_async:
        from ov2slam_tpu.models.pipeline import AsyncSlamManager

        slam = AsyncSlamManager(cfg)

    if args.trace:
        with Profiler.device_trace(args.trace):
            res = run_sequence(cfg, frames, gt_poses=gt, gt_times=gt_times,
                               T_body_cam=T_body_cam, out_dir=args.out,
                               slam=slam)
    else:
        res = run_sequence(cfg, frames, gt_poses=gt, gt_times=gt_times,
                           T_body_cam=T_body_cam, out_dir=args.out,
                           slam=slam)
    if slam is not None:
        slam.close()
    report = dict(
        frames=res.n_frames, processed=res.n_processed,
        dropped=res.n_dropped, keyframes=res.n_keyframes,
        closures=res.n_closures, wall_s=round(res.wall_s, 2),
        fps=round(res.fps, 2),
        ate_m=None if res.ate is None else round(res.ate, 4),
        ate_scaled_m=(None if res.ate_scaled is None
                      else round(res.ate_scaled, 4)),
    )
    print(json.dumps(report))
    if args.timings:
        print(Profiler.instance().summary(), file=sys.stderr)


if __name__ == "__main__":
    main()
