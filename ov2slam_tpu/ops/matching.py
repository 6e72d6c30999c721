"""Hamming-distance descriptor matching, fully batched.

Replaces the reference's brute-force BFMatcher knnMatch
(`src/loop_closer.cpp:378-459`) and the projection-guided BRIEF matching of
`Mapper::matchToMap` (`src/mapper.cpp:576-774`). Distances are computed as
one (N, M, words) XOR + ``lax.population_count`` reduction — the
TPU-friendly dense formulation (a 512x512x8 uint32 cube is trivial for the
VPU; the reference instead walks per-keypoint candidate lists).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

N_BITS = 256


def hamming_matrix(desc_a, desc_b):
    """(N, 8) x (M, 8) uint32 → (N, M) int32 Hamming distances."""
    x = jnp.bitwise_xor(desc_a[:, None, :], desc_b[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=())
def knn_match_2nn(desc_a, valid_a, desc_b, valid_b, max_dist_bits,
                  ratio: float = 0.85):
    """2-NN Hamming matching with Lowe ratio + absolute distance gate.

    Mirrors `LoopCloser::knnMatching` (`loop_closer.cpp:426-448`):
    keep a→b matches where best < ratio * second-best and best ≤ max bits.

    Returns:
      idx_b: (N,) int32 best match in b for each a (or -1),
      dist: (N,) int32 best distances.
    """
    D = hamming_matrix(desc_a, desc_b)
    D = jnp.where(valid_b[None, :], D, N_BITS + 1)

    best_idx = jnp.argmin(D, axis=1)
    best = jnp.take_along_axis(D, best_idx[:, None], axis=1)[:, 0]
    D2 = D.at[jnp.arange(D.shape[0]), best_idx].set(N_BITS + 1)
    second = jnp.min(D2, axis=1)

    ok = (
        valid_a
        & (best <= max_dist_bits)
        & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
    )
    return jnp.where(ok, best_idx, -1), best


@partial(jax.jit, static_argnames=())
def mutual_match(desc_a, valid_a, desc_b, valid_b, max_dist_bits):
    """Mutual (cross-check) nearest-neighbor matching."""
    D = hamming_matrix(desc_a, desc_b)
    D = jnp.where(valid_a[:, None] & valid_b[None, :], D, N_BITS + 1)
    best_ab = jnp.argmin(D, axis=1)
    best_ba = jnp.argmin(D, axis=0)
    d = jnp.take_along_axis(D, best_ab[:, None], axis=1)[:, 0]
    mutual = best_ba[best_ab] == jnp.arange(D.shape[0])
    ok = mutual & (d <= max_dist_bits) & valid_a
    return jnp.where(ok, best_ab, -1), d


@partial(jax.jit, static_argnames=())
def projection_match(
    proj_px, proj_valid, proj_desc,
    kp_px, kp_valid, kp_desc,
    max_px_dist, max_dist_bits, ratio: float = 0.9,
):
    """Projection-guided descriptor matching (`Mapper::matchToMap`,
    `mapper.cpp:576-774`): for each projected map point, consider only
    current keypoints within ``max_px_dist`` pixels, pick the best BRIEF
    match with a 2-NN ratio test over that neighborhood.

    Args:
      proj_px: (L, 2) projected map-point pixels.
      proj_desc: (L, 8) uint32 map-point descriptors.
      kp_px: (N, 2) current keypoint pixels.
      kp_desc: (N, 8) uint32.

    Returns:
      idx: (L,) int32 matched kp index or -1; dist (L,) int32.
    """
    D = hamming_matrix(proj_desc, kp_desc)                 # (L, N)
    px_d2 = jnp.sum(
        (proj_px[:, None, :] - kp_px[None, :, :]) ** 2, axis=-1)
    near = px_d2 <= max_px_dist * max_px_dist
    gate = near & kp_valid[None, :] & proj_valid[:, None]
    D = jnp.where(gate, D, N_BITS + 1)

    best_idx = jnp.argmin(D, axis=1)
    best = jnp.take_along_axis(D, best_idx[:, None], axis=1)[:, 0]
    D2 = D.at[jnp.arange(D.shape[0]), best_idx].set(N_BITS + 1)
    second = jnp.min(D2, axis=1)

    ok = (
        proj_valid
        & (best <= max_dist_bits)
        & ((best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
           | (second > N_BITS))
    )
    return jnp.where(ok, best_idx, -1), best
