import jax.numpy as jnp
import numpy as np
import pytest

from ov2slam_tpu.core.image import (
    build_pyramid, clahe, gaussian_blur, pyr_down, scharr_gradients,
)
from ov2slam_tpu.io.synthetic import generate_sequence, render_splats
from ov2slam_tpu.ops.brief import describe_brief
from ov2slam_tpu.ops.detect import (
    detect_grid_fast, detect_single_scale, fast_response, grid_detect,
    shi_tomasi_response,
)
from ov2slam_tpu.ops.klt import fb_klt_track, klt_track
from ov2slam_tpu.ops.matching import (
    hamming_matrix, knn_match_2nn, mutual_match, projection_match,
)


@pytest.fixture(scope="module")
def seq():
    return generate_sequence(n_frames=3, stereo=False, width=376, height=240,
                             n_points=1500, seed=1, speed=0.05)


# ------------------------------------------------------------------ image #

def test_pyramid_shapes(seq):
    img = jnp.asarray(seq.images_left[0])
    pyr = build_pyramid(img, 4)
    assert [p.shape for p in pyr] == [
        (240, 376), (120, 188), (60, 94), (30, 47)]


def test_gradients_on_ramp():
    ramp = jnp.asarray(
        np.arange(64, dtype=np.float32)[None, :].repeat(48, 0) * 2.0)
    gx, gy = scharr_gradients(ramp)
    # interior: exact slope 2 in x, 0 in y
    np.testing.assert_allclose(np.array(gx[5:-5, 5:-5]), 2.0, atol=1e-4)
    np.testing.assert_allclose(np.array(gy[5:-5, 5:-5]), 0.0, atol=1e-4)


def test_clahe_improves_contrast():
    rng = np.random.default_rng(0)
    # low-contrast image: values squeezed into [100, 130]
    img = rng.uniform(100, 130, size=(240, 376)).astype(np.float32)
    out = np.array(clahe(jnp.asarray(img), clip_limit=3.0))
    assert out.std() > img.std() * 1.5
    assert out.min() >= 0 and out.max() <= 255


# -------------------------------------------------------------- detection #

def test_shi_tomasi_finds_corner():
    img = np.full((96, 96), 20.0, np.float32)
    img[40:, 40:] = 200.0  # a corner at (40, 40)
    resp = np.array(shi_tomasi_response(jnp.asarray(img)))
    py, px = np.unravel_index(resp.argmax(), resp.shape)
    assert abs(px - 40) <= 2 and abs(py - 40) <= 2


def test_fast_response_corner_not_edge():
    img = np.full((64, 64), 50.0, np.float32)
    img[30:34, 30:34] = 250.0  # small bright blob -> strong FAST corners
    resp = np.array(fast_response(jnp.asarray(img), 20.0))
    assert resp[28:36, 28:36].max() > 0
    # pure horizontal edge has no FAST-9 corner
    edge = np.full((64, 64), 50.0, np.float32)
    edge[32:, :] = 250.0
    resp_e = np.array(fast_response(jnp.asarray(edge), 20.0))
    assert resp_e[5:-5, 5:-5].max() == 0.0


def test_grid_detect_one_per_cell(seq):
    img = jnp.asarray(seq.images_left[0])
    no_kps = jnp.zeros((1, 2))
    no_valid = jnp.zeros((1,), bool)
    kps, scores, ok = detect_single_scale(
        img, no_kps, no_valid, quality_level=0.01, cell_size=40, max_out=128)
    kps, ok = np.array(kps), np.array(ok)
    n = ok.sum()
    assert n > 20  # textured synthetic image: most cells fire
    # the guarantee is per-detector-cell top-1 + cross-cell NMS at radius
    # cell/4: all detections are at least cell/4 apart
    pts = kps[ok]
    d = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
    d[np.arange(len(pts)), np.arange(len(pts))] = np.inf
    assert d.min() >= 40 / 4 - 1e-3


def test_grid_detect_respects_occupancy(seq):
    img = jnp.asarray(seq.images_left[0])
    no_valid = jnp.zeros((1,), bool)
    kps0, _, ok0 = detect_single_scale(
        img, jnp.zeros((1, 2)), no_valid, 0.01, cell_size=40, max_out=128)
    # mark all detected as existing: nothing new should fire in those cells
    kps1, _, ok1 = detect_single_scale(
        img, kps0, ok0, 0.01, cell_size=40, max_out=128)
    k0 = np.array(kps0)[np.array(ok0)]
    k1 = np.array(kps1)[np.array(ok1)]
    cells0 = {(int(p[1] // 40), int(p[0] // 40)) for p in k0}
    cells1 = {(int(p[1] // 40), int(p[0] // 40)) for p in k1}
    assert not (cells0 & cells1)


def test_detect_grid_fast_runs(seq):
    img = jnp.asarray(seq.images_left[0])
    kps, scores, ok = detect_grid_fast(
        img, jnp.zeros((1, 2)), jnp.zeros((1,), bool), 10.0,
        cell_size=40, max_out=128)
    assert int(np.array(ok).sum()) > 10


# ------------------------------------------------------------------- KLT #

def test_klt_tracks_pure_translation():
    rng = np.random.default_rng(3)
    base = rng.uniform(0, 255, size=(128, 160)).astype(np.float32)
    base = np.array(gaussian_blur(jnp.asarray(base), 1.5, 3))
    shift = (3.0, 2.0)  # (dx, dy) px
    # shift via bilinear resample (subpixel-capable)
    from ov2slam_tpu.core.camera import bilinear_sample
    yy, xx = np.meshgrid(np.arange(128, dtype=np.float32),
                         np.arange(160, dtype=np.float32), indexing="ij")
    coords = jnp.asarray(np.stack([xx - shift[0], yy - shift[1]], -1))
    cur = bilinear_sample(jnp.asarray(base), coords)

    kps = jnp.asarray(
        rng.uniform([20, 20], [140, 108], size=(64, 2)).astype(np.float32))
    pyr_p = tuple(build_pyramid(jnp.asarray(base), 3))
    pyr_c = tuple(build_pyramid(cur, 3))
    tracked, status, err = klt_track(
        pyr_p, pyr_c, kps, kps, jnp.ones(64, bool), win=9, iters=30)
    tracked, status = np.array(tracked), np.array(status)
    assert status.mean() > 0.9
    flow = tracked[status] - np.array(kps)[status]
    # random-noise texture is self-similar at coarse levels, so a few tracks
    # may alias to a wrong minimum (the fb-check's job to kill); assert the
    # population: median exact to centipixels, >85% within 0.1 px.
    np.testing.assert_allclose(np.median(flow, 0), shift, atol=0.02)
    close = np.abs(flow - np.array(shift)).max(axis=1) < 0.1
    assert close.mean() > 0.85


def test_klt_large_motion_needs_pyramid():
    rng = np.random.default_rng(4)
    base = rng.uniform(0, 255, size=(240, 320)).astype(np.float32)
    base = np.array(gaussian_blur(jnp.asarray(base), 2.0, 4))
    shift = (14.0, -9.0)
    from ov2slam_tpu.core.camera import bilinear_sample
    yy, xx = np.meshgrid(np.arange(240, dtype=np.float32),
                         np.arange(320, dtype=np.float32), indexing="ij")
    cur = bilinear_sample(
        jnp.asarray(base),
        jnp.asarray(np.stack([xx - shift[0], yy - shift[1]], -1)))

    kps = jnp.asarray(
        rng.uniform([40, 40], [280, 200], size=(48, 2)).astype(np.float32))
    pyr_p = tuple(build_pyramid(jnp.asarray(base), 4))
    pyr_c = tuple(build_pyramid(cur, 4))
    tracked, status, _ = klt_track(pyr_p, pyr_c, kps, kps,
                                   jnp.ones(48, bool), win=9, iters=30)
    flow = np.array(tracked)[np.array(status)] - np.array(kps)[np.array(status)]
    assert np.array(status).mean() > 0.7
    np.testing.assert_allclose(np.median(flow, 0), shift, atol=0.1)


def test_fb_klt_rejects_occluded():
    """Forward-backward check kills tracks in a region that changed."""
    rng = np.random.default_rng(5)
    base = rng.uniform(0, 255, size=(128, 160)).astype(np.float32)
    base = np.array(gaussian_blur(jnp.asarray(base), 1.5, 3))
    cur = base.copy()
    cur[:, 80:] = rng.uniform(0, 255, size=(128, 80)).astype(np.float32)

    kps_ok = rng.uniform([15, 15], [70, 110], size=(24, 2))
    kps_bad = rng.uniform([95, 15], [145, 110], size=(24, 2))
    kps = jnp.asarray(np.concatenate([kps_ok, kps_bad]).astype(np.float32))
    pyr_p = tuple(build_pyramid(jnp.asarray(base), 3))
    pyr_c = tuple(build_pyramid(jnp.asarray(cur), 3))
    _, status = fb_klt_track(pyr_p, pyr_c, kps, kps, jnp.ones(48, bool),
                             win=9, iters=30, max_fb_dist=0.5)
    status = np.array(status)
    assert status[:24].mean() > 0.8
    assert status[24:].mean() < 0.3


def test_klt_on_synthetic_sequence(seq):
    """Track detected corners across a real rendered motion; compare with
    ground-truth reprojection flow."""
    img0 = jnp.asarray(seq.images_left[0])
    img1 = jnp.asarray(seq.images_left[1])
    kps, _, ok = detect_single_scale(
        img0, jnp.zeros((1, 2)), jnp.zeros((1,), bool), 0.02,
        cell_size=30, max_out=128)
    pyr0 = tuple(build_pyramid(img0, 4))
    pyr1 = tuple(build_pyramid(img1, 4))
    tracked, status = fb_klt_track(pyr0, pyr1, kps, kps, ok,
                                   win=9, iters=30, max_fb_dist=1.0)
    assert int(np.array(status).sum()) > 0.5 * int(np.array(ok).sum())


# ------------------------------------------------------------ BRIEF/match #

def test_brief_stable_under_small_shift():
    rng = np.random.default_rng(6)
    img = rng.uniform(0, 255, size=(128, 160)).astype(np.float32)
    img = np.array(gaussian_blur(jnp.asarray(img), 2.0, 4))
    kps = jnp.asarray(
        rng.uniform([25, 25], [135, 103], size=(32, 2)).astype(np.float32))
    d0, ok0 = describe_brief(jnp.asarray(img), kps, jnp.ones(32, bool))
    d1, ok1 = describe_brief(jnp.asarray(img), kps + 0.4, jnp.ones(32, bool))
    assert np.array(ok0).all()
    dist = np.diag(np.array(hamming_matrix(d0, d1)))
    assert dist.mean() < 40  # small shift: descriptors stay close
    # random pairs should be near 128 (half the bits)
    off = np.array(hamming_matrix(d0, d1))
    np.fill_diagonal(off, 128)
    assert off.mean() > 90


def test_knn_match_identity():
    rng = np.random.default_rng(7)
    img = np.array(gaussian_blur(
        jnp.asarray(rng.uniform(0, 255, size=(128, 160)).astype(np.float32)),
        2.0, 4))
    kps = jnp.asarray(
        rng.uniform([25, 25], [135, 103], size=(48, 2)).astype(np.float32))
    d, ok = describe_brief(jnp.asarray(img), kps, jnp.ones(48, bool))
    perm = rng.permutation(48)
    idx, dist = knn_match_2nn(d, ok, d[perm], ok[perm],
                              max_dist_bits=50, ratio=0.85)
    idx = np.array(idx)
    matched = idx >= 0
    assert matched.mean() > 0.9
    # matches must invert the permutation
    assert (perm[idx[matched]] == np.arange(48)[matched]).all()


def test_projection_match_gates_by_distance():
    rng = np.random.default_rng(8)
    img = np.array(gaussian_blur(
        jnp.asarray(rng.uniform(0, 255, size=(128, 160)).astype(np.float32)),
        2.0, 4))
    kps = jnp.asarray(
        rng.uniform([25, 25], [135, 103], size=(32, 2)).astype(np.float32))
    d, ok = describe_brief(jnp.asarray(img), kps, jnp.ones(32, bool))
    # projections 1px off their keypoints: matched; 30px off: rejected
    idx_near, _ = projection_match(kps + 1.0, ok, d, kps, ok, d, 2.0, 50)
    idx_far, _ = projection_match(kps + 30.0, ok, d, kps, ok, d, 2.0, 50)
    assert (np.array(idx_near) == np.arange(32)).mean() > 0.9
    assert (np.array(idx_far) < 0).mean() > 0.9


def test_mutual_match():
    rng = np.random.default_rng(9)
    img = np.array(gaussian_blur(
        jnp.asarray(rng.uniform(0, 255, size=(128, 160)).astype(np.float32)),
        2.0, 4))
    kps = jnp.asarray(
        rng.uniform([25, 25], [135, 103], size=(24, 2)).astype(np.float32))
    d, ok = describe_brief(jnp.asarray(img), kps, jnp.ones(24, bool))
    idx, _ = mutual_match(d, ok, d, ok, max_dist_bits=10)
    np.testing.assert_array_equal(np.array(idx), np.arange(24))


def test_line_min_sad_recovers_disparity():
    """SAD scan finds the true disparity on a rectified synthetic pair."""
    from ov2slam_tpu.io.synthetic import generate_sequence
    from ov2slam_tpu.ops.stereo_sad import line_min_sad
    from ov2slam_tpu.ops.detect import detect_single_scale
    from ov2slam_tpu.utils import lie_np

    seq = generate_sequence(n_frames=1, stereo=True, width=376, height=240,
                            n_points=1500, seed=21, speed=0.05)
    iml = jnp.asarray(seq.images_left[0])
    imr = jnp.asarray(seq.images_right[0])
    kps, _, ok = detect_single_scale(
        iml, jnp.zeros((1, 2)), jnp.zeros(1, bool), 0.02,
        cell_size=30, max_out=128)
    priors, sad, disp = line_min_sad(iml, imr, kps, ok, win=7, max_disp=80)
    priors, sad, disp = np.array(priors), np.array(sad), np.array(disp)
    ok = np.array(ok)

    # ground-truth disparity from the nearest rendered landmark
    K = seq.K
    M_cw = lie_np.pose_to_matrix(lie_np.pose_inverse(seq.gt_poses[0]))
    pc = (M_cw[:3, :3] @ seq.points.T).T + M_cw[:3, 3]
    vis = pc[:, 2] > 0.3
    u = pc[vis, 0] / pc[vis, 2] * K[0, 0] + K[0, 2]
    v = pc[vis, 1] / pc[vis, 2] * K[1, 1] + K[1, 2]
    z = pc[vis, 2]
    good = 0
    checked = 0
    for i in np.nonzero(ok)[0]:
        d2 = (u - kps[i, 0]) ** 2 + (v - kps[i, 1]) ** 2
        j = int(np.argmin(d2))
        if d2[j] > 4.0:
            continue
        gt_disp = K[0, 0] * 0.11 / z[j]
        if gt_disp >= 79:
            continue
        checked += 1
        if abs(disp[i] - gt_disp) <= 1.5:
            good += 1
    assert checked >= 20
    assert good / checked > 0.7, f"{good}/{checked}"


# ------------------------------------------------------------------ GFTT #

def _render_x_corners(centers, H=120, W=160, sharp=0.6):
    """Analytic checkerboard X-corners at fractional ``centers`` (x, y):
    f = s(a)s(b) + (1-s(a))(1-s(b)) with smooth steps along two axes.
    The saddle point of each corner is exactly at the center. Corners must
    be well separated (>= 4x the envelope) or their fields interfere and
    the true optimum moves off-center."""
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    img = np.full((H, W), 0.5)
    for (cx, cy) in centers:
        a = 1.0 / (1.0 + np.exp(-(xx - cx) / sharp))
        b = 1.0 / (1.0 + np.exp(-(yy - cy) / sharp))
        pat = a * b + (1 - a) * (1 - b)
        r2 = (xx - cx) ** 2 + (yy - cy) ** 2
        m = np.exp(-r2 / (2 * 10.0 ** 2))
        img = img * (1 - m) + pat * m
    return (img * 255.0).astype(np.float32)


def test_corner_subpix_accuracy_under_01px():
    """cornerSubPix parity (`feature_extractor.cpp:190-218`): refined
    corners must land within 0.1 px of the true saddle points."""
    from ov2slam_tpu.ops.detect import corner_subpix

    rng = np.random.default_rng(3)
    # well-separated grid + fractional jitter
    gx, gy = np.meshgrid([35.0, 80.0, 125.0], [35.0, 85.0])
    centers = (np.stack([gx.ravel(), gy.ravel()], -1)
               + rng.uniform(-0.5, 0.5, (6, 2)))
    img = _render_x_corners(centers)
    # start from integer-rounded positions (worst-case 0.5 px off)
    kps0 = np.round(centers).astype(np.float32)
    refined = np.array(corner_subpix(
        jnp.asarray(img), jnp.asarray(kps0), jnp.ones(len(kps0), bool)))
    err = np.linalg.norm(refined - centers, axis=-1)
    assert err.max() < 0.1, err


def test_detect_gftt_finds_and_refines(seq):
    """detect_gftt end-to-end: detects the rendered corners and refines
    each to <0.1 px; two-pass fill-in admits weaker corners too."""
    from ov2slam_tpu.ops.detect import detect_gftt

    rng = np.random.default_rng(7)
    gx, gy = np.meshgrid([40.0, 120.0], [30.0, 90.0])
    centers = (np.stack([gx.ravel(), gy.ravel()], -1)
               + rng.uniform(-0.5, 0.5, (4, 2)))
    img = _render_x_corners(centers)
    N = 128
    kps, scores, ok = detect_gftt(
        jnp.asarray(img), jnp.zeros((N, 2), jnp.float32),
        jnp.zeros(N, bool), 0.05, cell_size=20, max_out=N)
    kps, ok = np.array(kps), np.array(ok)
    det = kps[ok]
    for c in centers:
        d = np.linalg.norm(det - c, axis=-1).min()
        assert d < 0.1, (c, d)


def test_gftt_two_pass_fills_weak_cells():
    """A weak corner below the first-pass quality gate but above half of
    it must still be detected (two-pass fill-in,
    `feature_extractor.cpp:104-221`)."""
    from ov2slam_tpu.ops.detect import grid_detect, shi_tomasi_response

    strong = _render_x_corners([(30.0, 30.0)], H=80, W=160)
    weak = _render_x_corners([(110.0, 30.0)], H=80, W=160)
    img = np.maximum(strong, 0.5 * weak + 0.25 * 255)
    resp = shi_tomasi_response(jnp.asarray(img))
    th = 0.4 * float(jnp.max(resp))   # weak corner sits below this
    N = 128
    _, s1, ok1 = grid_detect(resp, jnp.zeros((N, 2), jnp.float32),
                             jnp.zeros(N, bool), th, cell_size=40,
                             max_out=N, two_pass=False)
    _, s2, ok2 = grid_detect(resp, jnp.zeros((N, 2), jnp.float32),
                             jnp.zeros(N, bool), th, cell_size=40,
                             max_out=N, two_pass=True)
    assert int(np.array(ok2).sum()) > int(np.array(ok1).sum())


def test_fb_klt_split_matches_and_retries():
    """3D/2D split tracker (`visual_front_end.cpp:187-271` semantics):
    with a GOOD prior the base-only pass must land where the full
    pyramid does; with a BAD prior the pass-2 pyramid retry must recover
    the track; and 2D kps (base_only=False) must track through the
    pyramid as usual."""
    from ov2slam_tpu.ops.klt import fb_klt_track_split

    rng = np.random.default_rng(7)
    base = rng.uniform(0, 255, size=(240, 320)).astype(np.float32)
    base = np.array(gaussian_blur(jnp.asarray(base), 2.0, 4))
    shift = (11.0, -7.0)
    from ov2slam_tpu.core.camera import bilinear_sample
    yy, xx = np.meshgrid(np.arange(240, dtype=np.float32),
                         np.arange(320, dtype=np.float32), indexing="ij")
    cur = bilinear_sample(
        jnp.asarray(base),
        jnp.asarray(np.stack([xx - shift[0], yy - shift[1]], -1)))

    N = 64
    kps = jnp.asarray(
        rng.uniform([40, 40], [280, 200], size=(N, 2)).astype(np.float32))
    valid = jnp.ones(N, bool)
    pyr_p = tuple(build_pyramid(jnp.asarray(base), 4))
    pyr_c = tuple(build_pyramid(cur, 4))

    good_prior = kps + jnp.asarray(shift, jnp.float32)

    # (a) good prior, all base_only: pass 1 should do nearly all the work
    trk, st = fb_klt_track_split(pyr_p, pyr_c, kps, good_prior, valid,
                                 jnp.ones(N, bool), n_sub=32,
                                 win=9, iters=30, max_fb_dist=0.5)
    st = np.array(st)
    assert st.mean() > 0.7
    flow = np.array(trk)[st] - np.array(kps)[st]
    np.testing.assert_allclose(np.median(flow, 0), shift, atol=0.1)

    # (b) mixed population at limited capacity: 3D kps with good priors
    # resolve in pass 1 (base only), leaving the subset for the 2D half,
    # which must still get the pyramid and find the 11px flow
    base_only = jnp.asarray(np.arange(N) % 2 == 0)
    mixed_prior = jnp.where(base_only[:, None], good_prior, kps)
    trk2, st2 = fb_klt_track_split(pyr_p, pyr_c, kps, mixed_prior, valid,
                                   base_only, n_sub=N // 2,
                                   win=9, iters=30, max_fb_dist=0.5)
    st2 = np.array(st2)
    for sel in (np.array(base_only), ~np.array(base_only)):
        grp = st2 & sel
        assert grp.sum() > 0.55 * sel.sum(), (grp.sum(), sel.sum())
        flow2 = np.array(trk2)[grp] - np.array(kps)[grp]
        np.testing.assert_allclose(np.median(flow2, 0), shift, atol=0.1)

    # (c) all-2D (base_only False): equivalent to the plain fb tracker
    trk3, st3 = fb_klt_track_split(pyr_p, pyr_c, kps, kps, valid,
                                   jnp.zeros(N, bool), n_sub=N,
                                   win=9, iters=30, max_fb_dist=0.5)
    ref, st_ref = fb_klt_track(pyr_p, pyr_c, kps, kps, valid,
                               win=9, iters=30, max_fb_dist=0.5)
    both = np.array(st3) & np.array(st_ref)
    assert both.mean() > 0.6
    d = np.abs(np.array(trk3) - np.array(ref))[both]
    assert d.max() < 0.5, f"split vs plain divergence {d.max():.2f}px"
