"""Pose-graph optimization over SE(3) relative-pose constraints.

Replaces `Optimizer::localPoseGraph` / `fullPoseGraph`
(`src/optimizer.cpp:2346-2591, 2783-2865`): a chain of consecutive
relative-pose edges plus loop edges, solved with damped Gauss-Newton
(SPARSE_NORMAL_CHOLESKY in the reference; here the system is assembled
densely — even a 1000-KF graph is a 6000² matrix, well within one chip).

Residual per edge (i, j):  r = log( T_meas⁻¹ · T_wi⁻¹ · T_wj )  ∈ R⁶,
the same `LeftSE3RelativePoseError` as `se3left_parametrization.hpp:76-99`.
Jacobians by forward-mode autodiff of the 12-dim per-edge function —
exactness over hand-derivation, still one fused batched pass.

The reference's full pose graph optimizes every *frame* with KFs constant
(`optimizer.cpp:2783`); `full_pose_graph` below does exactly that —
segment-decomposed and solved as one vmapped batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils import lie


def _edge_residual(T_wi, T_wj, T_meas):
    rel = lie.pose_compose(lie.pose_inverse(T_wi), T_wj)
    err = lie.pose_compose(lie.pose_inverse(T_meas), rel)
    return lie.se3_log(err)


def _edge_residual_tangent(xi_i, xi_j, T_wi, T_wj, T_meas):
    """Residual as a function of left-multiplicative tangent perturbations
    (differentiation point for the Jacobians)."""
    return _edge_residual(lie.pose_left_update(T_wi, xi_i),
                          lie.pose_left_update(T_wj, xi_j), T_meas)


_edge_jac = jax.vmap(
    jax.jacfwd(_edge_residual_tangent, argnums=(0, 1)),
    in_axes=(0, 0, 0, 0, 0))
_edge_res = jax.vmap(_edge_residual, in_axes=(0, 0, 0))


@partial(jax.jit, static_argnames=("iters",))
def pose_graph_solve(
    poses_wc,            # (M, 7)
    fixed,               # (M,) bool — gauge anchors (reference: loop KF)
    edge_i, edge_j,      # (E,) int32 indices (-1 pad)
    edge_T,              # (E, 7) measured T_ij = T_wi⁻¹ T_wj
    edge_weight,         # (E,) f32 (0 for padding; >1 for loop edges)
    iters: int = 10,
    lam0: float = 1e-4,
):
    """Damped Gauss-Newton pose-graph solve.

    Returns (new_poses (M, 7), final_cost ()).
    """
    f32 = jnp.float32
    M = poses_wc.shape[0]
    center = poses_wc[0, 4:7]
    poses = poses_wc.astype(f32).at[:, 4:7].add(-center)

    ei = jnp.maximum(edge_i, 0)
    ej = jnp.maximum(edge_j, 0)
    w = edge_weight.astype(f32)
    free = (~fixed).astype(f32)

    zeros6 = jnp.zeros((ei.shape[0], 6), f32)

    def cost_fn(poses):
        r = _edge_res(poses[ei], poses[ej], edge_T)
        return jnp.sum(w * jnp.sum(r * r, -1))

    def body(carry, _):
        poses, lam = carry
        r = _edge_res(poses[ei], poses[ej], edge_T)          # (E, 6)
        Ji, Jj = _edge_jac(zeros6, zeros6, poses[ei], poses[ej], edge_T)
        # mask fixed poses
        Ji = Ji * free[ei][:, None, None]
        Jj = Jj * free[ej][:, None, None]

        wJi = Ji * w[:, None, None]
        wJj = Jj * w[:, None, None]

        H = jnp.zeros((M, M, 6, 6), f32)
        H = H.at[ei, ei].add(jnp.einsum("eik,eil->ekl", wJi, Ji))
        H = H.at[ej, ej].add(jnp.einsum("eik,eil->ekl", wJj, Jj))
        H = H.at[ei, ej].add(jnp.einsum("eik,eil->ekl", wJi, Jj))
        H = H.at[ej, ei].add(jnp.einsum("eik,eil->ekl", wJj, Ji))
        b = jnp.zeros((M, 6), f32)
        b = b.at[ei].add(-jnp.einsum("eik,ei->ek", wJi, r))
        b = b.at[ej].add(-jnp.einsum("eik,ei->ek", wJj, r))

        # damping + identity for fixed/unconstrained poses
        eye6 = jnp.eye(6, dtype=f32)
        diag = jnp.maximum(jnp.diagonal(
            H[jnp.arange(M), jnp.arange(M)], axis1=-2, axis2=-1), 1e-8)
        H = H.at[jnp.arange(M), jnp.arange(M)].add(
            lam * diag[..., None] * eye6[None])
        H = H.at[jnp.arange(M), jnp.arange(M)].add(
            (1.0 - free)[:, None, None] * eye6[None])

        Hd = H.transpose(0, 2, 1, 3).reshape(M * 6, M * 6)
        dx = jnp.linalg.solve(Hd + 1e-8 * jnp.eye(M * 6, dtype=f32),
                              b.reshape(-1)).reshape(M, 6)
        dx = dx * free[:, None]

        new_poses = lie.pose_left_update(poses, dx)
        c0, c1 = cost_fn(poses), cost_fn(new_poses)
        accept = c1 < c0
        poses = jnp.where(accept, new_poses, poses)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8),
                        jnp.minimum(lam * 4.0, 1e2))
        return (poses, lam), c1

    (poses, _), costs = jax.lax.scan(
        body, (poses, jnp.asarray(lam0, f32)), None, length=iters)
    return poses.at[:, 4:7].add(center), costs[-1]


def build_chain_edges(poses_wc, kf_ids, loop_i=None, loop_j=None,
                      T_loop=None, loop_weight: float = 10.0):
    """Host helper: consecutive-KF chain edges (measured at current
    estimates, `optimizer.cpp:2387-2424`) plus an optional loop edge.

    Returns (edge_i, edge_j, edge_T, edge_weight) as numpy arrays.
    """
    import numpy as np

    from ..utils import lie_np

    M = len(kf_ids)
    ei, ej, eT, ew = [], [], [], []
    for a in range(M - 1):
        ei.append(a)
        ej.append(a + 1)
        eT.append(lie_np.pose_relative(poses_wc[a], poses_wc[a + 1]))
        ew.append(1.0)
    if loop_i is not None:
        ei.append(loop_i)
        ej.append(loop_j)
        eT.append(np.asarray(T_loop))
        ew.append(loop_weight)
    return (np.asarray(ei, np.int32), np.asarray(ej, np.int32),
            np.asarray(eT, np.float32), np.asarray(ew, np.float32))


# --------------------------------------------------------------------- #
# Full-trajectory pose graph (`Optimizer::fullPoseGraph`,
# `optimizer.cpp:2783-2865`): optimize EVERY frame pose over the
# consecutive relative-pose chain with keyframe poses held constant.
# With the KFs fixed, the chain decomposes into independent segments
# between consecutive keyframes — so instead of one sparse Cholesky over
# all frames (the reference's SPARSE_NORMAL_CHOLESKY), every segment is
# padded to one static shape and solved by a single vmapped batched GN:
# all segments in flight on the MXU at once.
# --------------------------------------------------------------------- #

def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def full_pose_graph(poses_init, poses_meas, is_kf, iters: int = 20):
    """Optimize all frame poses with keyframes fixed.

    Args:
      poses_init: (F, 7) starting poses (typically the LC-corrected
        replay — KF frames carry their optimized poses).
      poses_meas: (F, 7) the originally-estimated trajectory; consecutive
        relative poses of this sequence are the chain measurements
        (`optimizer.cpp:2797-2818` uses the logger's recorded motion).
      is_kf: (F,) bool — fixed frames.
      iters: GN iterations per segment (reference: 100 Ceres iters; the
        damped-GN segments converge in far fewer).

    Returns (F, 7) optimized poses (float64).
    """
    import numpy as np

    F = len(poses_init)
    poses_init = np.asarray(poses_init, np.float64)
    poses_meas = np.asarray(poses_meas, np.float64)
    is_kf = np.asarray(is_kf, bool)
    kf_idx = np.nonzero(is_kf)[0]
    if F < 3 or len(kf_idx) == 0:
        return poses_init.copy()

    # segments: [start..end] inclusive, cut at every keyframe; leading /
    # trailing non-KF runs are anchored on one side only
    cuts = [0] + list(kf_idx) + [F - 1]
    bounds = sorted(set(cuts))
    segs = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        if b - a >= 2:  # interior frames exist
            segs.append((a, b))
    if not segs:
        return poses_init.copy()

    pad = _next_pow2(max(b - a + 1 for a, b in segs))
    S = len(segs)
    P = np.zeros((S, pad, 7), np.float32)
    P[:, :, 0] = 1.0  # identity quats in padding
    FX = np.ones((S, pad), bool)
    EI = np.zeros((S, pad - 1), np.int32)
    EJ = np.zeros((S, pad - 1), np.int32)
    ET = np.zeros((S, pad - 1, 7), np.float32)
    ET[:, :, 0] = 1.0
    EW = np.zeros((S, pad - 1), np.float32)

    from ..utils import lie_np
    for s, (a, b) in enumerate(segs):
        m = b - a + 1
        P[s, :m] = poses_init[a:b + 1]
        fx = is_kf[a:b + 1].copy()
        fx[0] = True   # segment endpoints anchor the gauge; a leading/
        fx[-1] = True  # trailing non-KF endpoint is simply kept rigid
        FX[s, :m] = fx
        for e in range(m - 1):
            EI[s, e] = e
            EJ[s, e] = e + 1
            ET[s, e] = lie_np.pose_relative(poses_meas[a + e],
                                            poses_meas[a + e + 1])
            EW[s, e] = 1.0

    solve = jax.vmap(partial(pose_graph_solve, iters=iters))
    new_P, _ = solve(jnp.asarray(P), jnp.asarray(FX), jnp.asarray(EI),
                     jnp.asarray(EJ), jnp.asarray(ET), jnp.asarray(EW))
    new_P = np.asarray(new_P, np.float64)

    out = poses_init.copy()
    for s, (a, b) in enumerate(segs):
        m = b - a + 1
        inner = ~FX[s, :m]
        out[a:a + m][inner] = new_P[s, :m][inner]
    # renormalize quaternions after f32 solve
    out[:, :4] /= np.linalg.norm(out[:, :4], axis=1, keepdims=True)
    return out
