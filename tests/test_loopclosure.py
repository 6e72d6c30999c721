import jax.numpy as jnp
import numpy as np
import pytest

from ov2slam_tpu.core.image import gaussian_blur
from ov2slam_tpu.loopclosure.index import PlaceIndex
from ov2slam_tpu.ops.brief import describe_brief
from ov2slam_tpu.ops.detect import detect_single_scale


def place_desc(seed, shift=0.0):
    """Descriptors of a synthetic 'place': detected corners + BRIEF.
    ``shift`` translates the image (a revisit from a slightly different
    viewpoint re-detects mostly the same corners)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (160, 200)).astype(np.float32)
    img = np.array(gaussian_blur(jnp.asarray(base), 2.0, 4))
    if shift:
        img = np.roll(img, int(shift), axis=1)
    kps, _, ok = detect_single_scale(
        jnp.asarray(img), jnp.zeros((1, 2)), jnp.zeros(1, bool),
        0.01, cell_size=20, max_out=128)
    d, dok = describe_brief(jnp.asarray(img), kps, ok)
    return np.array(d), np.array(dok)


def test_place_index_finds_revisit():
    index = PlaceIndex(capacity=64, recent_mask=10, min_score=0.2)
    for i in range(40):
        d, ok = place_desc(1000 + i)
        index.add(i, d, ok)

    # two consecutive queries at place 5 (island consistency requirement)
    d_q, ok_q = place_desc(1005, shift=3)
    cand, score = index.query(d_q, ok_q)
    assert cand == -1  # first hit: not yet temporally consistent
    cand, score = index.query(d_q, ok_q)
    assert cand == 5
    assert score > 0.2


def test_place_index_rejects_novel_place():
    index = PlaceIndex(capacity=64, recent_mask=5, min_score=0.2)
    for i in range(20):
        d, ok = place_desc(2000 + i)
        index.add(i, d, ok)
    d_q, ok_q = place_desc(9999)  # never seen
    index.query(d_q, ok_q)
    cand, _ = index.query(d_q, ok_q)
    assert cand == -1


def test_place_index_masks_recent():
    index = PlaceIndex(capacity=64, recent_mask=10, min_score=0.2)
    d, ok = place_desc(42)
    for i in range(8):
        index.add(i, d, ok)
    cand, _ = index.query(d, ok)
    cand, _ = index.query(d, ok)
    assert cand == -1  # everything stored is recent


def test_place_index_excludes_covisible():
    index = PlaceIndex(capacity=64, recent_mask=2, min_score=0.2)
    d, ok = place_desc(43)
    for i in range(10):
        index.add(i, d, ok)
    index.query(d, ok, exclude=set(range(10)))
    cand, _ = index.query(d, ok, exclude=set(range(10)))
    assert cand == -1


def test_pallas_scores_match_xla():
    """Pallas scoring kernel (interpret mode on CPU) == XLA scan."""
    import jax.numpy as jnp

    from ov2slam_tpu.loopclosure.index import _match_scores
    from ov2slam_tpu.ops.pallas_hamming import match_scores_pallas

    rng = np.random.default_rng(3)
    M, N, Nq = 32, 128, 128
    store = rng.integers(0, 2**32, (M, N, 8), dtype=np.uint32)
    sv = rng.random((M, N)) > 0.2
    q = store[7].copy()
    qv = np.ones(Nq, bool)
    ref = np.array(_match_scores(jnp.asarray(store), jnp.asarray(sv),
                                 jnp.asarray(q), jnp.asarray(qv),
                                 jnp.int32(48)))
    pal = np.array(match_scores_pallas(jnp.asarray(store), jnp.asarray(sv),
                                       jnp.asarray(q), jnp.asarray(qv), 48,
                                       interpret=True))
    np.testing.assert_allclose(pal, ref, atol=0)
    # self-query hits everywhere except the ~20% invalidated descriptors
    assert pal[7] > 0.7
    assert pal[7] == pal.max()
