"""Pallas TPU kernel: place-recognition descriptor scoring.

Computes, for every stored keyframe, the fraction of query descriptors
whose best Hamming distance into that keyframe's descriptor set is below a
threshold — the scoring loop of `loopclosure/index.py` (the dense
replacement for iBoW-LCD's inverted file).

Why Pallas: the XLA formulation materializes a (chunk, Nq, N, 8) XOR cube
per scan step in HBM. The kernel keeps everything in VMEM: each grid
program owns one stored keyframe, XORs the resident query block against
it word-by-word (8 × (Nq, N) uint32 VPU ops), reduces min-over-N and
counts hits — HBM traffic is exactly one (N, 8) descriptor load per
keyframe plus one scalar store.

Falls back to interpret mode off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_WORDS = 8


CHUNK = 8  # keyframes per grid program (Mosaic sublane tiling)


def _score_kernel(th_ref, q_desc_ref, q_valid_ref, kf_desc_ref,
                  kf_valid_ref, out_ref):
    """One grid program = CHUNK stored keyframes.

    q_desc: (Nq, 8) uint32 resident query block
    kf_desc: (CHUNK, N, 8) uint32 keyframe descriptors
    out: (CHUNK, 1) f32 scores
    """
    q = q_desc_ref[:]                       # (Nq, 8)
    k = kf_desc_ref[:]                      # (C, N, 8)

    # accumulate Hamming distance word by word: 8 x (C, Nq, N) int32 VPU ops
    C = k.shape[0]
    dist = jnp.zeros((C, q.shape[0], k.shape[1]), jnp.int32)
    for w in range(N_WORDS):
        x = jnp.bitwise_xor(q[:, w][None, :, None], k[:, :, w][:, None, :])
        dist = dist + jax.lax.population_count(x).astype(jnp.int32)

    # invalid stored descriptors can never match
    dist = jnp.where(kf_valid_ref[:][:, None, :], dist, 257)
    best = jnp.min(dist, axis=2)            # (C, Nq)
    hits = (best <= th_ref[0]) & q_valid_ref[:][None, :]
    nq = jnp.maximum(jnp.sum(q_valid_ref[:].astype(jnp.float32)), 1.0)
    out_ref[:, 0] = jnp.sum(hits.astype(jnp.float32), axis=1) / nq


@functools.partial(jax.jit, static_argnames=("interpret",))
def match_scores_pallas(store_desc, store_valid, q_desc, q_valid,
                        match_bits, interpret: bool = False):
    """(M, N, 8) uint32, (M, N) bool, (Nq, 8) uint32, (Nq,) bool → (M,) f32.

    M must be a multiple of CHUNK (the index pads its capacity)."""
    M, N, _ = store_desc.shape
    assert M % CHUNK == 0, f"capacity {M} not a multiple of {CHUNK}"
    Nq = q_desc.shape[0]
    th = jnp.asarray([match_bits], jnp.int32)

    out = pl.pallas_call(
        _score_kernel,
        grid=(M // CHUNK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # th (1,)
            pl.BlockSpec((Nq, N_WORDS), lambda i: (0, 0)),    # query descs
            pl.BlockSpec((Nq,), lambda i: (0,)),              # query valid
            pl.BlockSpec((CHUNK, N, N_WORDS), lambda i: (i, 0, 0)),
            pl.BlockSpec((CHUNK, N), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((CHUNK, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, 1), jnp.float32),
        interpret=interpret,
    )(th, q_desc, q_valid, store_desc, store_valid)
    return out[:, 0]
