"""Pallas TPU kernel: place-recognition descriptor scoring on the MXU.

Computes, for every stored keyframe, the fraction of query descriptors
whose best Hamming distance into that keyframe's descriptor set is below a
threshold — the scoring loop of `loopclosure/index.py` (the dense
replacement for iBoW-LCD's inverted file,
`Thirdparty/obindex2/lib/include/obindex2/binary_index.h:81-158`).

Why the MXU: Hamming distance between 256-bit descriptors is a dot
product in disguise — with bits mapped to ±1,

    Ham(a, b) = (256 - <a_pm1, b_pm1>) / 2        (exact, integer-valued)

so scoring M stored keyframes against an Nq-descriptor query is one
(Nq, 256) x (256, M*N) matmul with a fused min-over-N reduction. On a
v5e that is ~137 GFLOP at 1,024 KFs x 512 descs — sub-millisecond on the
MXU, where the VPU XOR+popcount formulation is ~2.1e9 serial int ops.
bf16 inputs with f32 accumulation are EXACT here: the products are ±1
and partial sums are integers ≤ 256.

The kernel keeps the query block VMEM-resident across the stored-KF grid
and reduces each (Nq, N) dot tile to its per-query max before the next
tile is touched — no (Nq, M*N) intermediate ever exists in HBM.

Falls back to interpret mode off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_WORDS = 8
N_BITS = 256

CHUNK = 8  # stored keyframes per grid program


def unpack_pm1(desc: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """(…, 8) uint32 packed descriptors → (…, 256) bf16 in {-1, +1}.

    Invalid rows are zeroed: their dot products become 0 → Hamming 128,
    which never passes a (<128)-bit gate, so they cannot match."""
    bits = jnp.arange(32, dtype=jnp.uint32)
    # (..., 8, 32) little-endian bit order — must match the XOR+popcount
    # path bit-for-bit so scores are identical
    b = (desc[..., None] >> bits) & jnp.uint32(1)
    pm1 = jnp.where(b == 1, 1.0, -1.0).astype(jnp.bfloat16)
    pm1 = pm1.reshape(*desc.shape[:-1], N_BITS)
    return jnp.where(valid[..., None], pm1, jnp.bfloat16(0.0))


def _score_kernel(th_ref, q_bits_ref, q_valid_ref, kf_bits_ref,
                  kf_valid_ref, out_ref):
    """One grid program = CHUNK stored keyframes.

    q_bits: (Nq, 256) bf16 resident query block (±1, 0 for invalid)
    kf_bits: (CHUNK, N, 256) bf16 stored descriptors (±1, 0 for invalid)
    out: (CHUNK, 1) f32 scores
    """
    q = q_bits_ref[:]                      # (Nq, 256)
    qv = q_valid_ref[:]                    # (Nq,)
    nq = jnp.maximum(jnp.sum(qv.astype(jnp.float32)), 1.0)
    th_dot = 256.0 - 2.0 * th_ref[0]       # Ham <= th  ⇔  dot >= th_dot

    best = []
    for c in range(CHUNK):                 # static unroll
        k = kf_bits_ref[c]                 # (N, 256)
        dots = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (Nq, N) MXU
        dots = jnp.where(kf_valid_ref[c][None, :], dots, -257.0)
        best.append(jnp.max(dots, axis=1))                # (Nq,)
    # keep reductions 2D (Mosaic has no scalar stores / 1-D offsets):
    # (CHUNK, Nq) hit matrix -> one row-sum -> one (CHUNK,) store
    best2 = jnp.stack(best)                               # (CHUNK, Nq)
    hits = (best2 >= th_dot) & qv[None, :]
    out_ref[:, 0] = jnp.sum(hits.astype(jnp.float32), axis=1) / nq


@functools.partial(jax.jit, static_argnames=("interpret",))
def match_scores_bits(store_bits, store_valid, q_bits, q_valid,
                      match_bits, interpret: bool = False):
    """(M, N, 256) bf16, (M, N) bool, (Nq, 256) bf16, (Nq,) bool → (M,) f32.

    ``match_bits`` must be < 128 (invalid rows score Hamming 128).
    M must be a multiple of CHUNK (the index pads its capacity)."""
    M, N, _ = store_bits.shape
    assert M % CHUNK == 0, f"capacity {M} not a multiple of {CHUNK}"
    Nq = q_bits.shape[0]
    th = jnp.asarray([match_bits], jnp.float32)

    out = pl.pallas_call(
        _score_kernel,
        grid=(M // CHUNK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # th (1,)
            pl.BlockSpec((Nq, N_BITS), lambda i: (0, 0)),     # query bits
            pl.BlockSpec((Nq,), lambda i: (0,)),              # query valid
            pl.BlockSpec((CHUNK, N, N_BITS), lambda i: (i, 0, 0)),
            pl.BlockSpec((CHUNK, N), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((CHUNK, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, 1), jnp.float32),
        interpret=interpret,
    )(th, q_bits, q_valid, store_bits, store_valid)
    return out[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def match_scores_pallas(store_desc, store_valid, q_desc, q_valid,
                        match_bits, interpret: bool = False):
    """(M, N, 8) uint32, (M, N) bool, (Nq, 8) uint32, (Nq,) bool → (M,) f32.

    Convenience wrapper over :func:`match_scores_bits` that unpacks the
    packed uint32 descriptors on device. The index hot path keeps a
    persistent pre-unpacked ±1 cube instead (see ``PlaceIndex``)."""
    store_bits = unpack_pm1(store_desc, store_valid)
    q_bits = unpack_pm1(q_desc, q_valid)
    return match_scores_bits(store_bits, store_valid, q_bits, q_valid,
                             match_bits, interpret=interpret)
