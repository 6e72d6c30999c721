"""Distributed bundle adjustment over a TPU device mesh.

The scaling architecture promised by the survey (§5 "sequence
parallelism" analogue): observations (and their landmark blocks) are
sharded across the mesh; every device performs the Gauss-Newton
block accumulations and the per-landmark Schur elimination for its shard;
the reduced camera-camera system — tiny: (Kw·6)² — is combined with
``psum`` over ICI and solved replicated; landmark back-substitution is
local to each shard again.

The reference has no distributed mode at all (single process, §2 of the
survey); this module is the TPU-native scaling path for large maps
(CARLA-scale, all-EuRoC multi-host BA): more chips → more observations
and landmarks per solve at fixed wall-clock.

Communication pattern per LM iteration (all over ICI):
- psum of Hpp (Kw,6,6), bp (Kw,6), S_corr (Kw,Kw,6,6), b_corr (Kw,6)
  → O(Kw²·36) bytes, independent of observation count,
- no landmark traffic: Hll/bl/back-substitution stay shard-local because
  landmarks are partitioned with their observations.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solvers.ba import BAParams, _huber_weight, _residuals_jacobians
from ..utils import lie

AXIS = "obs_shard"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def shard_ba_problem(prob, n_shards: int):
    """Partition a BAProblem's observations by landmark block so each
    shard owns a contiguous landmark range plus all its observations.

    Returns dict of numpy arrays with a leading shard axis; landmark
    arrays are also sharded (padded per shard).
    """
    Lw = len(prob.lm_ids)
    per = -(-Lw // n_shards)

    # assign each observation to the shard of its landmark
    shard_of_lm = np.minimum(np.maximum(prob.obs_lm, 0) // per, n_shards - 1)
    # capacity = densest shard (rounded up for alignment)
    counts = np.bincount(shard_of_lm[prob.obs_valid], minlength=n_shards)
    per_obs = max(8, int(counts.max()))

    obs_kf = np.full((n_shards, per_obs), -1, np.int32)
    obs_lm = np.full((n_shards, per_obs), 0, np.int32)
    obs_px = np.zeros((n_shards, per_obs, 2), np.float32)
    obs_cam = np.zeros((n_shards, per_obs), np.int8)
    obs_valid = np.zeros((n_shards, per_obs), bool)

    for s in range(n_shards):
        rows = np.nonzero(prob.obs_valid & (shard_of_lm == s))[0][:per_obs]
        n = len(rows)
        obs_kf[s, :n] = prob.obs_kf[rows]
        # landmark index relative to the shard's block
        obs_lm[s, :n] = prob.obs_lm[rows] - s * per
        obs_px[s, :n] = prob.obs_px[rows]
        obs_cam[s, :n] = prob.obs_cam[rows]
        obs_valid[s, :n] = True

    lm_pos = np.zeros((n_shards, per, 3), np.float32)
    lm_ids = np.full((n_shards, per), -1, np.int32)
    for s in range(n_shards):
        lo, hi = s * per, min((s + 1) * per, Lw)
        lm_pos[s, : hi - lo] = prob.lm_pos[lo:hi]
        lm_ids[s, : hi - lo] = prob.lm_ids[lo:hi]

    return dict(obs_kf=obs_kf, obs_lm=obs_lm, obs_px=obs_px,
                obs_cam=obs_cam, obs_valid=obs_valid,
                lm_pos=lm_pos, lm_ids=lm_ids)


def _local_schur(T_cw, points, lam, obs_kf, obs_lm, obs_px, obs_cam, w,
                 free_pose, params):
    """Shard-local GN accumulations + landmark elimination.

    Returns (Hpp, bp, S_corr, b_corr, Z, Hll_inv, bl) — the first four are
    psum-reduced by the caller; Z/Hll_inv/bl stay local for back-subst.
    """
    Kw = T_cw.shape[0]
    Lw = points.shape[0]

    r, Jp, Jl, depth_ok = _residuals_jacobians(
        T_cw, points, obs_kf, obs_lm, obs_px, obs_cam, params)
    w = w * depth_ok
    Jp = Jp * free_pose[obs_kf][:, None, None]

    wJp = Jp * w[:, None, None]
    wJl = Jl * w[:, None, None]

    Hpp = jnp.zeros((Kw, 6, 6), r.dtype).at[obs_kf].add(
        jnp.einsum("oik,oil->okl", wJp, Jp))
    Hll = jnp.zeros((Lw, 3, 3), r.dtype).at[obs_lm].add(
        jnp.einsum("oik,oil->okl", wJl, Jl))
    bp = jnp.zeros((Kw, 6), r.dtype).at[obs_kf].add(
        -jnp.einsum("oik,oi->ok", wJp, r))
    bl = jnp.zeros((Lw, 3), r.dtype).at[obs_lm].add(
        -jnp.einsum("oik,oi->ok", wJl, r))

    eyeL = jnp.eye(3, dtype=r.dtype)
    Hll_d = Hll + (lam * jnp.maximum(
        jnp.diagonal(Hll, axis1=-2, axis2=-1), 1e-6))[..., None] * eyeL[None]
    Hll_inv = jnp.linalg.inv(Hll_d + 1e-8 * eyeL[None])

    Wo = jnp.einsum("oik,oil->okl", wJp, Jl)
    Z = jnp.zeros((Lw, Kw, 6, 3), r.dtype).at[obs_lm, obs_kf].add(Wo)
    ZH = jnp.einsum("lkab,lbc->lkac", Z, Hll_inv)
    S_corr = jnp.einsum("lkac,lqdc->kqad", ZH, Z)
    b_corr = jnp.einsum("lkac,lc->ka", ZH, bl)

    return Hpp, bp, S_corr, b_corr, Z, Hll_inv, bl


def _iteration_sharded(T_cw, points, lam, shard, free_pose, params,
                       robust_th):
    """One LM iteration under shard_map: everything shard-local except the
    psum of the reduced camera system."""
    obs_kf = jnp.maximum(shard["obs_kf"][0], 0)
    obs_lm = shard["obs_lm"][0]
    obs_px = shard["obs_px"][0]
    obs_cam = shard["obs_cam"][0]
    obs_valid = shard["obs_valid"][0]
    points_local = points[0]
    Kw = T_cw.shape[0]

    # robust weights at current state
    r, _, _, depth_ok = _residuals_jacobians(
        T_cw, points_local, obs_kf, obs_lm, obs_px, obs_cam, params)
    chi2 = jnp.sum(r * r, -1)
    w_rob = jnp.where(robust_th > 0, _huber_weight(chi2, robust_th), 1.0)
    w = obs_valid.astype(r.dtype) * w_rob * depth_ok

    Hpp, bp, S_corr, b_corr, Z, Hll_inv, bl = _local_schur(
        T_cw, points_local, lam, obs_kf, obs_lm, obs_px, obs_cam, w,
        free_pose, params)

    # reduce the camera system over the mesh (ICI traffic: O(Kw² 6²))
    Hpp = jax.lax.psum(Hpp, AXIS)
    bp = jax.lax.psum(bp, AXIS)
    S_corr = jax.lax.psum(S_corr, AXIS)
    b_corr = jax.lax.psum(b_corr, AXIS)

    eyeK = jnp.eye(6, dtype=jnp.float32)
    Hpp_d = Hpp + (lam * jnp.maximum(
        jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-6))[..., None] * eyeK[None]
    S = -S_corr
    S = S.at[jnp.arange(Kw), jnp.arange(Kw)].add(Hpp_d)
    S = jnp.where((free_pose[:, None] * free_pose[None, :])[..., None, None],
                  S, 0.0)
    S = S.at[jnp.arange(Kw), jnp.arange(Kw)].add(
        (1.0 - free_pose)[:, None, None] * eyeK[None])
    b_schur = (bp - b_corr) * free_pose[:, None]

    Sd = S.transpose(0, 2, 1, 3).reshape(Kw * 6, Kw * 6)
    dx_pose = jnp.linalg.solve(
        Sd + 1e-6 * jnp.eye(Kw * 6, dtype=jnp.float32),
        b_schur.reshape(-1)).reshape(Kw, 6)

    # shard-local landmark back-substitution
    corr = jnp.einsum("lkab,ka->lb", Z, dx_pose)
    dx_lm = jnp.einsum("lab,lb->la", Hll_inv, bl - corr)

    new_T_cw = lie.pose_left_update(T_cw, dx_pose * free_pose[:, None])
    new_points = points_local + dx_lm

    # total cost (for LM accept/reject), psum over shards
    def shard_cost(T, pts):
        r_, _, _, dok = _residuals_jacobians(
            T, pts, obs_kf, obs_lm, obs_px, obs_cam, params)
        c2 = jnp.sum(r_ * r_, -1)
        rho = jnp.where((robust_th > 0) & (c2 > robust_th),
                        2.0 * jnp.sqrt(robust_th * jnp.maximum(c2, 0.0))
                        - robust_th, c2)
        return jnp.sum(rho * obs_valid * dok)

    cost0 = jax.lax.psum(shard_cost(T_cw, points_local), AXIS)
    cost1 = jax.lax.psum(shard_cost(new_T_cw, new_points), AXIS)
    return new_T_cw, new_points[None], cost0, cost1


def make_distributed_ba(mesh: Mesh, params: BAParams, robust_th: float,
                        iters: int):
    """Build the jitted distributed BA step for a given mesh.

    Returns ``step(kf_poses, kf_fixed, sharded_problem_dict) ->
    (new_poses, new_lm_pos_sharded, final_cost)``.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    shard_specs = dict(
        obs_kf=P(AXIS), obs_lm=P(AXIS), obs_px=P(AXIS),
        obs_cam=P(AXIS), obs_valid=P(AXIS),
        lm_pos=P(AXIS), lm_ids=P(AXIS))

    def solve(kf_poses, kf_fixed, shard):
        # runs per-device under shard_map; shard arrays have leading dim 1
        T_cw = lie.pose_inverse(kf_poses)
        free = (~kf_fixed).astype(jnp.float32)
        points = shard["lm_pos"]

        def body(carry, _):
            T_cw, points, lam = carry
            T_new, p_new, c0, c1 = _iteration_sharded(
                T_cw, points, lam, shard, free, params, robust_th)
            accept = c1 < c0
            T_cw = jnp.where(accept, T_new, T_cw)
            points = jnp.where(accept, p_new, points)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-6),
                            jnp.minimum(lam * 4.0, 1e2))
            return (T_cw, points, lam), c1

        (T_cw, points, _), costs = jax.lax.scan(
            body, (T_cw, points, jnp.float32(1e-3)), None, length=iters)
        return lie.pose_inverse(T_cw), points, costs[-1]

    in_shard = {k: shard_specs[k] for k in
                ["obs_kf", "obs_lm", "obs_px", "obs_cam", "obs_valid",
                 "lm_pos", "lm_ids"]}
    del in_shard["lm_ids"]

    mapped = shard_map(
        solve, mesh=mesh,
        in_specs=(P(), P(), in_shard),
        out_specs=(P(), P(AXIS), P()))

    @jax.jit
    def step(kf_poses, kf_fixed, shard):
        shard = {k: v for k, v in shard.items() if k != "lm_ids"}
        return mapped(kf_poses, kf_fixed, shard)

    return step


def distributed_ba_solve(mesh, prob, params, robust_th=5.9915, iters=5):
    """Host entry: shard a BAProblem over the mesh and solve.

    Returns (new_kf_poses (Kw, 7) np, new_lm_pos (Lw, 3) np, cost).
    """
    n = len(mesh.devices.flat)
    shard_np = shard_ba_problem(prob, n)
    sharding = {k: NamedSharding(mesh, P(AXIS)) for k in shard_np}
    shard_dev = {k: jax.device_put(v, sharding[k])
                 for k, v in shard_np.items()}

    step = make_distributed_ba(mesh, params, robust_th, iters)
    poses, lm_sharded, cost = step(
        jnp.asarray(prob.kf_poses), jnp.asarray(prob.kf_fixed), shard_dev)

    # un-shard landmarks back to the problem's flat order (shard s holds
    # the contiguous landmark block [s*per, (s+1)*per))
    lm = np.array(lm_sharded).reshape(-1, 3)
    Lw = len(prob.lm_ids)
    out = np.array(prob.lm_pos)
    n_shards, per = shard_np["lm_ids"].shape
    for s in range(n_shards):
        lo = s * per
        hi = min(lo + per, Lw)
        out[lo:hi] = lm[s * per: s * per + (hi - lo)]
    return np.array(poses), out, float(cost)
