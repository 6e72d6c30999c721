"""Repro: chained-frontend accuracy on the loop sequence (CPU)."""
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
import numpy as np

from ov2slam_tpu.io.synthetic import generate_sequence
from ov2slam_tpu.models.slam import SlamManager
from ov2slam_tpu.utils.evaluation import ate_rmse

depth = int(sys.argv[1]) if len(sys.argv) > 1 else 2
use_lc = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True

seq = generate_sequence(n_frames=160, stereo=True, width=376, height=240,
                        n_points=4000, seed=6, speed=0.06, kind="loop")
cfg = seq.make_config(max_keyframes=128, max_landmarks=16384,
                      use_fast=False, use_singlescale_detector=True,
                      max_dist=30, use_loop_closer=use_lc,
                      lc_recent_mask=10, lc_min_score=0.2)
if depth > 0:
    cfg.pipelined_frontend = True
    cfg.pipeline_depth = depth
t0 = time.perf_counter()
slam = SlamManager(cfg)
for i in range(len(seq.times)):
    slam.process_frame(seq.images_left[i], seq.images_right[i],
                       float(seq.times[i]))
times, poses = slam.estimated_trajectory()
wall = time.perf_counter() - t0
ate = ate_rmse(poses, seq.gt_poses[:len(poses)], align_scale=False)
end_err = np.linalg.norm(poses[-1, 4:7] - seq.gt_poses[len(poses) - 1, 4:7])
ncl = slam.loop_closer.n_closures if use_lc else 0
print(f"depth={depth} lc={use_lc} ate={float(ate):.4f} end={float(end_err):.4f} "
      f"closures={ncl} resets={slam.n_resets} kfs={slam.map.n_keyframes} "
      f"wall={wall:.0f}s")
