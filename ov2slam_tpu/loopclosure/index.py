"""Binary-descriptor place-recognition index.

TPU-native replacement for iBoW-LCD + obindex2
(`Thirdparty/ibow_lcd/src/lcdetector.cc`, `Thirdparty/obindex2/lib/...`).
The reference prunes search with an incremental hierarchical vocabulary
tree + inverted file; on TPU the dense formulation is both simpler and
faster at realistic map sizes: score every stored keyframe by *exact*
descriptor match counts, computed as blocked XOR + ``population_count``
tensor ops (a (chunk, Nq, N) uint32 cube per step of a ``lax.scan``) —
no tree, no approximation, bounded compute per query.

Score(query, KF) = fraction of query descriptors whose best Hamming
distance into the KF's descriptor set is below ``match_bits`` — the dense
analogue of shared-visual-word counting.

Temporal-consistency grouping ("islands", `ibow_lcd/island.h`) and the
recent-frame mask (`lcdetector.h:42-60`) are host logic.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_CHUNK = 16


@partial(jax.jit, donate_argnums=(0, 1))
def _set_rows(desc_cube, valid_cube, i, d_row, v_row):
    """Write one stored-KF row into the device-resident cubes IN PLACE
    (donated buffers: XLA aliases input/output, no cube copy) — one
    dispatch instead of two full-cube copies per added keyframe."""
    return (desc_cube.at[i].set(d_row), valid_cube.at[i].set(v_row))


@partial(jax.jit, donate_argnums=(0, 1))
def _set_rows_bits(bits_cube, valid_cube, i, d_row, v_row):
    """TPU variant: unpack the packed uint32 row to ±1 bf16 on device and
    write it into the persistent bit cube (donated, in place)."""
    from ..ops.pallas_hamming import unpack_pm1

    return (bits_cube.at[i].set(unpack_pm1(d_row, v_row)),
            valid_cube.at[i].set(v_row))


@jax.jit
def _unpack_pm1_j(d, v):
    """Module-level jitted unpack: a fresh `jax.jit(unpack_pm1)` wrapper
    per call would re-trace on every query (each wrapper owns its own
    cache) — hoisted so the hot query path hits one cached executable."""
    from ..ops.pallas_hamming import unpack_pm1

    return unpack_pm1(d, v)


@partial(jax.jit, static_argnames=())
def _match_scores(store_desc, store_valid, q_desc, q_valid, match_bits):
    """Scores of a query against all stored KFs.

    store_desc: (M, N, 8) uint32; q_desc: (Nq, 8) uint32.
    Returns (M,) f32 — fraction of query descs matched per stored KF.
    """
    M = store_desc.shape[0]

    def chunk_scores(chunk):
        desc, valid = chunk
        # (C, Nq, N, 8) xor-popcount
        x = jnp.bitwise_xor(q_desc[None, :, None, :], desc[:, None, :, :])
        d = jnp.sum(jax.lax.population_count(x), axis=-1)  # (C, Nq, N)
        d = jnp.where(valid[:, None, :], d, 257)
        best = jnp.min(d, axis=-1)                          # (C, Nq)
        hits = (best <= match_bits) & q_valid[None, :]
        return hits.sum(axis=-1).astype(jnp.float32)

    n_chunks = M // _CHUNK
    desc_c = store_desc[: n_chunks * _CHUNK].reshape(
        n_chunks, _CHUNK, *store_desc.shape[1:])
    valid_c = store_valid[: n_chunks * _CHUNK].reshape(
        n_chunks, _CHUNK, store_valid.shape[1])
    counts = jax.lax.map(chunk_scores, (desc_c, valid_c)).reshape(-1)
    nq = jnp.maximum(q_valid.sum(), 1)
    return counts / nq


class PlaceIndex:
    """Incremental dense-scoring index with island grouping."""

    def __init__(self, capacity: int, recent_mask: int = 30,
                 island_radius: int = 3, min_score: float = 0.25,
                 match_bits: int = 48):
        cap = ((capacity + _CHUNK - 1) // _CHUNK) * _CHUNK
        self.capacity = cap
        self.recent_mask = recent_mask
        self.island_radius = island_radius
        self.min_score = min_score
        self.match_bits = match_bits
        self._desc: Optional[np.ndarray] = None   # (cap, N, 8)
        self._valid: Optional[np.ndarray] = None  # (cap, N)
        # device-resident mirror of the store: re-uploading the full
        # descriptor cube every query costs ~10 MB of host->device traffic
        # per query on a tunneled TPU (observed: 5 q/s instead of 100+);
        # instead only freshly added rows are shipped, on demand
        self._dev_desc = None
        self._dev_valid = None
        self._n_dev = 0
        self.kf_ids: List[int] = []
        # insertion seq of each entry's KF: map slot ids are recycled, so
        # an entry is stale when the slot's current seq no longer matches
        self.kf_seqs: List[int] = []
        self._last_candidate: Optional[int] = None

    def add(self, kfid: int, desc: np.ndarray, valid: np.ndarray,
            seq: Optional[int] = None, seq_lookup=None):
        if self._desc is None:
            N = desc.shape[0]
            self._desc = np.zeros((self.capacity, N, 8), np.uint32)
            self._valid = np.zeros((self.capacity, N), bool)
        if len(self.kf_ids) >= self.capacity:
            self._compact(seq_lookup)
        i = len(self.kf_ids)
        self._desc[i] = desc
        self._valid[i] = valid
        self.kf_ids.append(kfid)
        self.kf_seqs.append(-1 if seq is None else int(seq))

    def _compact(self, seq_lookup=None):
        """Reclaim rows at capacity: a long run pushes more keyframes
        through the index than it holds (map slots recycle via culling /
        eviction). Stale rows — whose map slot was culled or recycled —
        go first; if none are stale, the oldest eighth is dropped (those
        keyframes are the next eviction candidates in a bounded map)."""
        n = len(self.kf_ids)
        keep = np.ones(n, bool)
        if seq_lookup is not None:
            ids = np.asarray(self.kf_ids, np.int64)
            seqs = np.asarray(self.kf_seqs, np.int64)
            cur = np.asarray(seq_lookup(ids), np.int64)
            keep = ~((seqs >= 0) & (cur != seqs))
        if keep.all():
            keep[: max(1, n // 8)] = False
        idx = np.nonzero(keep)[0]
        m = len(idx)
        self._desc[:m] = self._desc[idx]
        self._valid[:m] = self._valid[idx]
        self._valid[m:] = False
        self.kf_ids = [self.kf_ids[j] for j in idx]
        self.kf_seqs = [self.kf_seqs[j] for j in idx]
        self._dev_desc = None        # device mirror invalidated
        self._n_dev = 0
        self._last_candidate = None

    def _mask_stale(self, scores: np.ndarray, seq_lookup) -> np.ndarray:
        """Score stale entries (culled or recycled KF slots) to -1."""
        if seq_lookup is None:
            return scores
        n = len(scores)
        ids = np.asarray(self.kf_ids[:n], np.int64)
        seqs = np.asarray(self.kf_seqs[:n], np.int64)
        cur = np.asarray(seq_lookup(ids), np.int64)
        scores[(seqs >= 0) & (cur != seqs)] = -1.0
        return scores

    def _device_store(self):
        """Device copies of the store, updated incrementally: only rows
        added since the last query are transferred. On TPU the store is
        kept as a pre-unpacked ±1 bf16 cube so each query is a pure MXU
        matmul (`ops/pallas_hamming.py`); off-TPU the packed uint32 cube
        feeds the XLA XOR+popcount path."""
        on_tpu = jax.default_backend() == "tpu"
        if self._dev_desc is None or len(self.kf_ids) - self._n_dev > 32:
            if on_tpu:
                self._dev_desc = _unpack_pm1_j(
                    jnp.asarray(self._desc), jnp.asarray(self._valid))
            else:
                self._dev_desc = jnp.asarray(self._desc)
            self._dev_valid = jnp.asarray(self._valid)
            self._n_dev = len(self.kf_ids)
        else:
            set_rows = _set_rows_bits if on_tpu else _set_rows
            while self._n_dev < len(self.kf_ids):
                i = self._n_dev
                self._dev_desc, self._dev_valid = set_rows(
                    self._dev_desc, self._dev_valid, jnp.int32(i),
                    jnp.asarray(self._desc[i]),
                    jnp.asarray(self._valid[i]))
                self._n_dev += 1
        return self._dev_desc, self._dev_valid

    def _raw_scores(self, desc: np.ndarray, valid: np.ndarray,
                    usable: int) -> np.ndarray:
        dev_desc, dev_valid = self._device_store()
        if jax.default_backend() == "tpu":
            # MXU kernel: Hamming-as-matmul with fused min reduction
            from ..ops.pallas_hamming import match_scores_bits

            q_bits = _unpack_pm1_j(jnp.asarray(desc), jnp.asarray(valid))
            return np.array(match_scores_bits(
                dev_desc, dev_valid, q_bits, jnp.asarray(valid),
                self.match_bits))[:usable]
        return np.array(_match_scores(
            dev_desc, dev_valid,
            jnp.asarray(desc), jnp.asarray(valid),
            jnp.int32(self.match_bits)))[:usable]

    def query_best(self, desc: np.ndarray, valid: np.ndarray,
                   top_k: int = 3, seq_lookup=None) -> List[Tuple[int, float]]:
        """Top-k scoring keyframes with NO recency mask and NO island
        temporal-consistency gate — used for relocalization after tracking
        loss, where a single lost frame must match immediately and recent
        keyframes are the most likely matches."""
        n = len(self.kf_ids)
        if n == 0 or self._desc is None:
            return []
        scores = self._mask_stale(self._raw_scores(desc, valid, n),
                                  seq_lookup)
        order = np.argsort(-scores)[:top_k]
        return [(self.kf_ids[int(i)], float(scores[int(i)]))
                for i in order if scores[int(i)] >= 0]

    def query(self, desc: np.ndarray, valid: np.ndarray,
              exclude: Optional[set] = None,
              seq_lookup=None) -> Tuple[int, float]:
        """Best loop candidate for a query descriptor set.

        Returns (kf_id, score) or (-1, 0.0). Requires temporal consistency:
        two consecutive queries must hit the same island
        (`lcdetector.cc` island tracking) before a candidate is emitted.
        """
        n = len(self.kf_ids)
        usable = n - self.recent_mask
        if usable < 1:
            return -1, 0.0
        scores = self._mask_stale(self._raw_scores(desc, valid, usable),
                                  seq_lookup)
        if exclude:
            for i, k in enumerate(self.kf_ids[:usable]):
                if k in exclude:
                    scores[i] = -1.0

        # scored islands (`ibow_lcd::LCDetector` island grouping,
        # `lcdetector.cc` / `island.h`): group above-threshold entries
        # into temporally contiguous islands, score each island by the
        # SUM of its member scores (a true revisit lights up several
        # consecutive stored keyframes; a perceptual-aliasing one-off
        # usually lights up one), apply a prior boost to the island
        # consistent with the previous query, and require two consecutive
        # consistent hits before emitting.
        #
        # Consistency is TRACKED at half the emission threshold: a true
        # revisit's scores ramp up over several keyframes (approach
        # geometry), and gating the tracker at the full threshold would
        # throw away that history — the first full-threshold hit then
        # finds no prior island and a short revisit window (a closing
        # circle) ends before a second one arrives. Emission still
        # requires min_score AND a consistent previous island.
        above = np.nonzero(scores >= 0.5 * self.min_score)[0]
        if len(above) == 0:
            self._last_candidate = None
            return -1, 0.0
        # contiguous runs with gaps <= island_radius
        splits = np.nonzero(np.diff(above) > self.island_radius)[0] + 1
        islands = np.split(above, splits)

        def island_stats(members):
            ssum = float(scores[members].sum())
            center = int(members[np.argmax(scores[members])])
            return ssum, center

        stats = [island_stats(m) for m in islands]
        if self._last_candidate is not None:
            # prior: prefer the island containing/near the last match
            stats = [
                (ssum * (1.5 if abs(center - self._last_candidate)
                         <= 2 * self.island_radius else 1.0), center)
                for ssum, center in stats]
        ssum, island_center = max(stats)
        best_score = float(scores[island_center])

        consistent = (
            self._last_candidate is not None
            and abs(self._last_candidate - island_center)
            <= 2 * self.island_radius
        )
        self._last_candidate = island_center
        if not consistent or best_score < self.min_score:
            return -1, 0.0
        return self.kf_ids[island_center], best_score


def bit_signature(desc: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Cheap (256,) bit-frequency signature (kept for diagnostics)."""
    if valid.sum() == 0:
        return np.zeros(256, np.float32)
    d = desc[valid]
    bits = np.unpackbits(
        d.view(np.uint8), bitorder="little").reshape(len(d), 256)
    sig = bits.mean(axis=0).astype(np.float32) - 0.5
    n = np.linalg.norm(sig)
    return sig / n if n > 0 else sig
