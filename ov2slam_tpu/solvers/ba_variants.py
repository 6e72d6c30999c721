"""The remaining Optimizer problem types, expressed on top of `ba_solve`.

The reference's Optimizer exposes six NLLS problems (`include/optimizer.
hpp:33-67`); `localBA` lives in `models/estimator.py`. Here:

- ``structure_only_ba`` — landmarks only, poses const
  (`Optimizer::structureOnlyBA`, `optimizer.cpp:2594-2781`): ba_solve with
  every pose gauge-fixed (the Schur camera system degenerates to identity
  and only the per-landmark 3x3 solves remain).
- ``loose_ba`` — all KFs in an id range, boundary fixed
  (`Optimizer::looseBA`, `optimizer.cpp:900-1672`), used after loop
  closure.
- ``full_ba`` — every KF, first fixed (`Optimizer::fullBA`,
  `optimizer.cpp:1674-2332`), the optional final pass (`do_full_ba`).

`fullPoseGraph` (`optimizer.cpp:2783-2865`) optimizes every frame with KFs
constant; that is equivalent to replaying logged relative poses from the
optimized keyframes — `TrajectoryLogger.replay_with_keyframes`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .ba import BAParams, ba_solve, ba_solve_two_pass


def _solve_window(map_store, window, fixed_ids, params: BAParams,
                  cfg, max_kfs: int, max_obs: int,
                  iters: Optional[int] = None):
    prob = map_store.build_ba_problem(
        window, fixed_ids, max_kfs=max_kfs, max_obs=max_obs)
    if prob.n_obs < 10:
        return 0
    if getattr(cfg, "use_inv_depth", False):
        # the reference applies the anchored inverse-depth
        # parameterization to every BA problem type when `buse_inv_depth`
        # is set (`optimizer.cpp:207-290` and the looseBA/fullBA/
        # structureOnlyBA equivalents)
        from .ba_invdepth import ba_solve_invdepth_two_pass, invdepth_state

        rho, ray, obs_valid = invdepth_state(prob, params)
        poses, points, _, inlier, _ = ba_solve_invdepth_two_pass(
            jnp.asarray(prob.kf_poses), jnp.asarray(prob.kf_fixed),
            jnp.asarray(rho), jnp.asarray(prob.lm_anchor),
            jnp.asarray(ray),
            jnp.asarray(prob.obs_kf), jnp.asarray(prob.obs_lm),
            jnp.asarray(prob.obs_px), jnp.asarray(prob.obs_cam),
            jnp.asarray(obs_valid), params,
            robust_th=cfg.robust_mono_th,
            iters_robust=iters or cfg.ba_iters,
            iters_l2=3 if cfg.apply_l2_after_robust else 0)
    else:
        poses, points, inlier, _ = ba_solve_two_pass(
            jnp.asarray(prob.kf_poses), jnp.asarray(prob.kf_fixed),
            jnp.asarray(prob.lm_pos),
            jnp.asarray(prob.obs_kf), jnp.asarray(prob.obs_lm),
            jnp.asarray(prob.obs_px), jnp.asarray(prob.obs_cam),
            jnp.asarray(prob.obs_valid), params,
            robust_th=cfg.robust_mono_th,
            iters_robust=iters or cfg.ba_iters,
            iters_l2=3 if cfg.apply_l2_after_robust else 0)
    map_store.apply_ba_result(prob, np.array(poses), np.array(points))
    return int(prob.n_obs)


def structure_only_ba(map_store, kf_ids: Sequence[int], params: BAParams,
                      cfg) -> int:
    """Refine only the landmarks observed by ``kf_ids``; poses constant."""
    window = [int(k) for k in kf_ids if map_store.kf_valid[k]]
    return _solve_window(
        map_store, window, window, params, cfg,
        max_kfs=min(len(window) + 1, cfg.local_ba_max_kfs),
        max_obs=cfg.local_ba_max_obs)


def loose_ba(map_store, kf_min: int, kf_max: int, params: BAParams,
             cfg) -> int:
    """BA over the keyframes created between ``kf_min`` and ``kf_max``
    (inclusive, by insertion seq — slot ids are recycled so id ranges are
    meaningless); the two oldest are gauge-fixed (post-LC refinement)."""
    m = map_store
    s_lo, s_hi = int(m.kf_seq[kf_min]), int(m.kf_seq[kf_max])
    window = [int(k) for k in m.kfs_by_seq()
              if s_lo <= m.kf_seq[k] <= s_hi]
    if len(window) < 3:
        return 0
    fixed = window[:2]
    cap_kfs = max(cfg.local_ba_max_kfs, len(window))
    return _solve_window(map_store, window, fixed, params, cfg,
                         max_kfs=cap_kfs, max_obs=4 * cfg.local_ba_max_obs)


def full_ba(map_store, params: BAParams, cfg,
            iters: Optional[int] = None) -> int:
    """Global BA over every valid keyframe; KF 0 (and the next oldest for
    mono gauge) fixed. The reference runs this only at shutdown when
    `do_full_ba` is set (`ov2slam.cpp:600-615`)."""
    window = [int(k) for k in map_store.kfs_by_seq()]
    if len(window) < 3:
        return 0
    n_fix = 1 if cfg.stereo else 2
    fixed = window[:n_fix]
    return _solve_window(
        map_store, window, fixed, params, cfg,
        max_kfs=len(window), max_obs=8 * cfg.local_ba_max_obs,
        iters=iters or 2 * cfg.ba_iters)
