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


# ------------------------------------------------- recall / aliasing #

def blend_desc(seed_a, seed_b, alpha, shift=0.0):
    """A place whose appearance is a pixel blend of two base scenes —
    used to build a perceptual-aliasing decoy (similar but not equal)."""
    rng_a = np.random.default_rng(seed_a)
    rng_b = np.random.default_rng(seed_b)
    base = (alpha * rng_a.uniform(0, 255, (160, 200))
            + (1 - alpha) * rng_b.uniform(0, 255, (160, 200))
            ).astype(np.float32)
    img = np.array(gaussian_blur(jnp.asarray(base), 2.0, 4))
    if shift:
        img = np.roll(img, int(shift), axis=1)
    kps, _, ok = detect_single_scale(
        jnp.asarray(img), jnp.zeros((1, 2)), jnp.zeros(1, bool),
        0.01, cell_size=20, max_out=128)
    d, dok = describe_brief(jnp.asarray(img), kps, ok)
    return np.array(d), np.array(dok)


def test_scored_islands_reject_perceptual_alias():
    """Trajectory: room A (0-7) → corridor (8-15) → decoy room B, built
    70%-similar to A (16-23) → revisit A (24-27). The revisit queries
    must hit room A entries, never the decoy, despite B scoring above
    the floor (round-1 verdict #6: aliasing negative test)."""
    index = PlaceIndex(capacity=64, recent_mask=4, island_radius=2,
                       min_score=0.2)
    kf = 0
    for i in range(8):                       # room A
        d, ok = index_add = blend_desc(500, 900, 1.0, shift=2 * i)
        index.add(kf, d, ok); kf += 1
    for i in range(8):                       # corridor (novel)
        d, ok = blend_desc(7000 + i, 7100 + i, 0.5)
        index.add(kf, d, ok); kf += 1
    for i in range(8):                       # decoy room (similar to A)
        d, ok = blend_desc(500, 901, 0.7, shift=2 * i)
        index.add(kf, d, ok); kf += 1

    hits = []
    for i in range(4):                       # revisit room A
        d, ok = blend_desc(500, 900, 1.0, shift=2 * i + 1)
        cand, score = index.query(d, ok)
        index.add(kf, d, ok); kf += 1
        if cand >= 0:
            hits.append(cand)
    assert len(hits) >= 1, "revisit not recalled"
    assert all(h < 8 for h in hits), f"aliased to decoy: {hits}"


def test_island_sum_scoring_prefers_true_island():
    """A one-off high-scoring outlier entry must lose to a contiguous
    island of slightly lower scores (island SUM scoring, lcdetector.cc)."""
    index = PlaceIndex(capacity=64, recent_mask=4, island_radius=2,
                       min_score=0.2)
    kf = 0
    for i in range(6):                       # true island: room A
        d, ok = blend_desc(42, 43, 1.0, shift=3 * i)
        index.add(kf, d, ok); kf += 1
    for i in range(6):                       # unrelated filler
        d, ok = blend_desc(8000 + i, 8100 + i, 0.5)
        index.add(kf, d, ok); kf += 1
    # one decoy similar to the query
    d, ok = blend_desc(42, 44, 0.72)
    index.add(kf, d, ok); kf += 1
    for i in range(3):                       # more filler → decoy not recent
        d, ok = blend_desc(9000 + i, 9100 + i, 0.5)
        index.add(kf, d, ok); kf += 1

    got = []
    for i in range(3):
        d, ok = blend_desc(42, 43, 1.0, shift=3 * i + 1)
        cand, _ = index.query(d, ok)
        index.add(kf, d, ok); kf += 1
        if cand >= 0:
            got.append(cand)
    assert len(got) >= 1
    assert all(g < 6 for g in got), got


@pytest.mark.slow
def test_loop_closure_fires_at_fast_kp_budget():
    """E2E: circular revisit with the fast profile's sparse kp budget
    (nmaxdist 50 → 160 cells). The ≤max_kps extra FAST/BRIEF query
    keypoints (loop_closer.cpp:89-140) keep recall up at this density."""
    from ov2slam_tpu.io.synthetic import generate_sequence
    from ov2slam_tpu.models.slam import SlamManager

    # two-lap revisit: the whole second lap re-observes lap-1 viewpoints,
    # so the island temporal-consistency gate (>=2 consecutive hits) has a
    # real revisit phase to latch onto — a single-lap circle only matches
    # in its last 1-2 keyframes, which no detector should accept
    seq = generate_sequence(n_frames=200, stereo=True, width=376,
                            height=240, n_points=4000, seed=6,
                            kind="revisit", speed=0.06)
    # the FAST profile's sparse budget: nmaxdist 50, gridFAST detector.
    # Local-map matching is OFF: on a drift-free synthetic loop it would
    # silently merge lap-2 observations into lap-1 landmarks, making every
    # candidate covisibility-excluded (the map closes itself and LC
    # correctly has nothing to do). Disabling it models the real revisit
    # case — accumulated drift defeats local-map matching and the place
    # index has to recognize the loop.
    cfg = seq.make_config(max_keyframes=128, max_landmarks=16384,
                          use_fast=True, max_dist=50,
                          use_loop_closer=True, lc_recent_mask=10,
                          lc_min_score=0.2, do_track_localmap=False)
    slam = SlamManager(cfg)
    for i in range(len(seq.times)):
        slam.process_frame(seq.images_left[i], seq.images_right[i],
                           float(seq.times[i]))
    assert slam.loop_closer.n_closures >= 1
