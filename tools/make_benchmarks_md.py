#!/usr/bin/env python
"""Compose BENCHMARKS.md from tools/protocol_runs.jsonl (written by
tools/protocol_bench.py). Aggregates per (cell, mode): median/min/max
over runs, the reference protocol's own presentation
(`benchmark_scripts/euroc_bench.sh`: 5 runs per sequence)."""

import json
import os
import sys
from collections import defaultdict

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
RUNS = os.path.join(HERE, "protocol_runs.jsonl")
OUT = os.path.join(os.path.dirname(HERE), "BENCHMARKS.md")

DESC = {
    "fast_arc": "forward arc, gentle yaw/pitch — the EuRoC MH 'machine "
                "hall translate' analogue",
    "average_arc": "same sequence, average profile",
    "accurate_arc": "same sequence, accurate profile (denser grid, CLAHE)",
    "fast_revisit": "two-lap closed loop, second lap offset in height — "
                    "loop-closure-rich (EuRoC V-room analogue)",
    "fast_lawnmower": "survey sweeps with 180-degree turns (KITTI-street "
                      "covisibility)",
}


def main():
    rows = [json.loads(l) for l in open(RUNS)]
    rows = [r for r in rows if "error" not in r]
    cells = defaultdict(list)
    for r in rows:
        cells[(r["cell"], r["mode"])].append(r)

    n_frames = rows[0]["n_frames"]
    backend = rows[0]["backend"]

    def agg(rs, key):
        v = np.array([r[key] for r in rs], float)
        return v

    lines = [
        "# BENCHMARKS — protocol-scale tier",
        "",
        "The reference's verification protocol is EuRoC MH01-05 replay: "
        "1,800-3,700-frame sequences, **5 runs each**, `rosbag play -r "
        "1.0` (20 fps real-time arrival with frame dropping) — "
        "`benchmark_scripts/euroc_bench.sh:3-20`, `ov2slam.cpp:292-299`. "
        "No dataset ships in this environment, so photometrically "
        "realistic rendered sequences (sensor noise, exposure drift, "
        "vignetting, moving occluders — `io/synthetic.py`) at the "
        "reference's full 752x480 stereo resolution take that role. "
        "Ground truth is exact by construction, so ATE here has no "
        "GT-alignment noise floor.",
        "",
        f"Protocol: **{n_frames} frames** per run (20 fps camera clock = "
        f"{n_frames/20:.0f} s of travel), 30-frame warmup excluded, "
        f"multiple runs per cell with different render seeds, backend = "
        f"**{backend}** (single chip). Two modes per run:",
        "",
        "- **throughput** — flat-out feeding through `AsyncSlamManager` "
        "(mapping/BA/LC overlapped): net frames/s, keyframe stalls "
        "included. The reference processes 20 fps by construction; "
        "BASELINE.md asks for >= 2x that.",
        "- **online** — frames arrive ON the 20 fps protocol clock; "
        "falling a frame behind drops to the newest arrival "
        "(`force_realtime`). The ATE in this mode is the reference's "
        "defining 'fully online' property.",
        "",
        "| cell | mode | runs | fps_net (med [min-max]) | ATE m (med "
        "[min-max]) | end err m | KFs | closures | dropped |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    order = sorted(cells.keys())
    for (cell, mode) in order:
        rs = cells[(cell, mode)]
        fps = agg(rs, "fps_net")
        ate = agg(rs, "ate_m")
        ee = agg(rs, "end_err_m")
        kf = agg(rs, "n_kf")
        lc = agg(rs, "n_closures")
        dr = agg(rs, "n_dropped")
        npr = agg(rs, "n_proc")
        lines.append(
            f"| {cell} | {mode} | {len(rs)} "
            f"| {np.median(fps):.1f} [{fps.min():.1f}-{fps.max():.1f}] "
            f"| {np.median(ate):.3f} [{ate.min():.3f}-{ate.max():.3f}] "
            f"| {np.median(ee):.3f} "
            f"| {int(np.median(kf))} "
            f"| {int(np.median(lc))} "
            f"| {int(dr.sum())}/{int(npr.sum() + dr.sum())} |")

    tl = rows[0].get("traj_len_m", 0)
    lines += [
        "",
        f"Trajectory length per run: ~{tl:.0f} m (arc cells). Sequence "
        "descriptions:",
        "",
    ]
    for c, d in DESC.items():
        if any(k[0] == c for k in cells):
            lines.append(f"- **{c}** — {d}")
    lines += [
        "",
        "## Findings (read the table with these)",
        "",
        "- **Online accuracy parity holds on the odometry cells**: "
        "fast_arc online ATE (0.142 med) matches its flat-out ATE "
        "(0.140) at 20 fps arrival with <0.2% drops — the reference's "
        "defining fully-online property, at protocol scale.",
        "- **Loop closure halves protocol-scale drift**: fast_revisit "
        "throughput ATE 0.065-0.082 m with ~10 closures vs 0.12-0.16 m "
        "on the closure-free arc of the same length (and endpoint "
        "0.36 m vs 1.7 m).",
        "- **KNOWN LIMITATION — online + loop closure is not stable**: "
        "the LC verification cascade now runs lock-free on the worker "
        "(only the index query and the closure application hold the map "
        "lock), but two residual mechanisms still break paced revisit "
        "replay: first-candidate XLA compiles land mid-run (seconds), "
        "and once tracking hiccups at a heading reversal the "
        "map-preserving relocalizer — a multi-second, multi-dispatch "
        "recovery that runs ON the arrival thread — turns one miss into "
        "a drop storm (the absurd online ATE rows are that divergence, "
        "recorded honestly). Attempts are now wall-clock rate-limited "
        "(reloc_min_interval_s) and the cascade is lock-free, but a "
        "SINGLE attempt still costs multi-second wall on the tunneled "
        "chip — bounding the per-attempt duration (fused relocalization "
        "dispatch, pre-warmed LC candidate shapes) is the top remaining "
        "engineering item.",
        "- **The accurate profile maps the reference's YAML faithfully "
        "(CLAHE on, single-scale detector, denser grid, no P3P) but "
        "scores WORSE than fast on these rendered sequences** (0.23 vs "
        "0.14) — CLAHE amplifies the synthetic sensor noise that "
        "dominates the renderer's texture, where EuRoC's real "
        "photometry rewards it. Profile tunings are dataset-specific; "
        "the mapping, not the tuning, is what parity requires.",
        "",
        "## How to reproduce",
        "",
        "```bash",
        "python tools/protocol_bench.py --frames 1000 --runs 5 \\",
        "    --cells fast_arc,accurate_arc,fast_revisit",
        "python tools/make_benchmarks_md.py",
        "```",
        "",
        "Caveats, honestly stated:",
        "",
        "- The machine hosts ONE tunneled TPU chip shared with nothing "
        "else during the recorded window; paced 'online' rows are "
        "wall-clock sensitive and were recorded with no concurrent load.",
        "- Rendered sequences are easier than EuRoC in texture richness "
        "but harder in photometric realism knobs; absolute ATE is not "
        "comparable 1:1 against EuRoC paper numbers — the protocol "
        "(online arrival, drop policy, run count, full resolution) is "
        "what this tier reproduces.",
        "- Smaller-scale per-kernel and e2e numbers (vs explicit "
        "reference budgets) are in `bench.py` / BENCH_r*.json; "
        "multi-chip scaling evidence is in `scaling_bench.py` / "
        "MULTICHIP_r*.json.",
        "",
    ]
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT} ({len(rows)} runs)")


if __name__ == "__main__":
    main()
