"""Diagnose the async-mode accuracy gap on the 752x480 arc (TPU)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from ov2slam_tpu.io.synthetic import DEFAULT_REALISM, stream_sequence
from ov2slam_tpu.utils.evaluation import ate_rmse
from ov2slam_tpu.utils.profiles import apply_profile

mode = sys.argv[1] if len(sys.argv) > 1 else "sync"
n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 90

seq = stream_sequence(n_frames=n_frames, stereo=True, width=752, height=480,
                      n_points=8000, seed=0, kind="arc", speed=0.05,
                      realism=DEFAULT_REALISM)
frames = list(seq)
cfg = seq.make_config()
apply_profile(cfg, "fast")
cfg.pipelined_frontend = True
cfg.pipeline_depth = 2
cfg.validate()

if mode == "sync":
    from ov2slam_tpu.models.slam import SlamManager

    mgr = SlamManager(cfg)
else:
    from ov2slam_tpu.models.pipeline import AsyncSlamManager

    mgr = AsyncSlamManager(cfg)
    if mode == "nodefer":
        mgr._allow_new_kf = lambda: mgr._kf_inflight is None
    elif mode == "nopressure":
        # never skip optional stages under backlog
        orig = mgr._process_kf
        mgr._process_kf = lambda kfid, seq, pyr, img_right, \
            under_pressure, fold_kfs=(): orig(
                kfid, seq, pyr, img_right, False, fold_kfs)

pace = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
interval = 1.0 / pace if pace else 0.0
t_all0 = time.perf_counter()
i = n_warm = 0
n_dropped = 0
while i < len(frames):
    if pace and i == 30:
        t_all0 = time.perf_counter() - 30 * interval   # rebase post-warm
    if pace and i > 30:
        t_sched = t_all0 + i * interval
        now = time.perf_counter()
        if now < t_sched:
            time.sleep(t_sched - now)
        elif now > t_sched + interval and i < len(frames) - 1:
            nb = min(int((now - t_sched) / interval), len(frames) - 1 - i)
            i += nb
            n_dropped += nb
            print(f"  frame {i}: dropped {nb}")
    left, right, t = frames[i]
    t0 = time.perf_counter()
    mgr.process_frame(left, right, t)
    w = time.perf_counter() - t0
    if w > 0.1:
        print(f"  frame {i}: wall {w*1e3:.0f} ms")
    if mode == "lockstep" and hasattr(mgr, "flush"):
        mgr.flush()
    i += 1
print(f"dropped={n_dropped}")

est_times, est_poses = mgr.estimated_trajectory()
gt_t = np.asarray(seq.times)
gt = np.asarray(seq.gt_poses)
idx = np.clip(np.searchsorted(gt_t, est_times), 0, len(gt) - 1)
ate = float(ate_rmse(est_poses, gt[idx], align_scale=False))
nerr = getattr(mgr, "n_worker_errors", 0)
print(f"mode={mode} ate={ate:.4f} kfs={mgr.map.n_keyframes} "
      f"resets={mgr.n_resets} worker_errors={nerr}")
if mode != "sync":
    mgr.close()
