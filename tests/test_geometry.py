import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ov2slam_tpu.geometry.essential import (
    decompose_essential, eight_point, essential_from_pose, essential_ransac,
    relative_pose_ransac, sampson_dist_sq,
)
from ov2slam_tpu.geometry.pnp import p3p_kneip, p3p_lmeds, p3p_ransac
from ov2slam_tpu.geometry.poly import solve_cubic_real, solve_quartic_real
from ov2slam_tpu.geometry.triangulation import (
    reprojection_checks, triangulate_dlt, triangulate_midpoint,
)
from ov2slam_tpu.utils import lie


# ---------------------------------------------------------------- helpers #

def make_scene(rng, n=100, baseline=None, rot=None):
    """Ground-truth two-view scene: world == left frame."""
    pts = rng.uniform([-2, -2, 4], [2, 2, 12], size=(n, 3))
    if baseline is None:
        baseline = np.array([0.3, 0.05, -0.1])
    if rot is None:
        rot = np.array([0.05, -0.1, 0.03])
    T_lr = np.concatenate([np.array(lie.so3_exp(jnp.asarray(rot))), baseline])
    M_rl = np.array(lie.pose_to_matrix(lie.pose_inverse(jnp.asarray(T_lr))))
    pts_r = (M_rl[:3, :3] @ pts.T).T + M_rl[:3, 3]
    return pts, pts_r, T_lr


def bearings(pts):
    return pts / np.linalg.norm(pts, axis=-1, keepdims=True)


# ------------------------------------------------------------ polynomials #

def test_cubic_real_root():
    # z^3 - 6z^2 + 11z - 6 = (z-1)(z-2)(z-3); largest root 3
    root = solve_cubic_real(jnp.array(-6.0), jnp.array(11.0), jnp.array(-6.0))
    assert abs(float(root) - 3.0) < 1e-9
    # one real root case: z^3 + z + 10 → real root -2
    root = solve_cubic_real(jnp.array(0.0), jnp.array(1.0), jnp.array(10.0))
    np.testing.assert_allclose(float(root), -2.0, atol=1e-9)


def test_quartic_batched(rng):
    true_roots = rng.uniform(-3, 3, size=(50, 4))
    coeffs = np.stack([np.poly(r) for r in true_roots])  # monic, leading 1
    roots, valid = solve_quartic_real(
        jnp.asarray(coeffs[:, 1]), jnp.asarray(coeffs[:, 2]),
        jnp.asarray(coeffs[:, 3]), jnp.asarray(coeffs[:, 4]))
    roots = np.array(roots)
    valid = np.array(valid)
    assert valid.all()
    for i in range(50):
        np.testing.assert_allclose(
            np.sort(roots[i]), np.sort(true_roots[i]), atol=1e-6)


def test_quartic_complex_pairs():
    # (x^2+1)(x-2)(x-5): two real roots only
    coeffs = np.poly([1j, -1j, 2.0, 5.0]).real
    roots, valid = solve_quartic_real(
        jnp.array(coeffs[1]), jnp.array(coeffs[2]),
        jnp.array(coeffs[3]), jnp.array(coeffs[4]))
    real_roots = np.sort(np.array(roots)[np.array(valid)])
    np.testing.assert_allclose(real_roots, [2.0, 5.0], atol=1e-7)


# ---------------------------------------------------------- triangulation #

def test_triangulate_midpoint_exact(rng):
    pts_l, pts_r, T_lr = make_scene(rng)
    out = triangulate_midpoint(
        jnp.asarray(T_lr)[None], jnp.asarray(bearings(pts_l)),
        jnp.asarray(bearings(pts_r)))
    np.testing.assert_allclose(np.array(out), pts_l, atol=1e-9)


def test_triangulate_dlt_exact(rng):
    pts_l, pts_r, T_lr = make_scene(rng)
    out = triangulate_dlt(
        jnp.asarray(T_lr)[None], jnp.asarray(bearings(pts_l)),
        jnp.asarray(bearings(pts_r)))
    np.testing.assert_allclose(np.array(out), pts_l, atol=1e-7)


def test_triangulate_noise_robust(rng):
    """With pixel noise, midpoint stays within a few cm at EuRoC geometry."""
    pts_l, pts_r, T_lr = make_scene(
        rng, baseline=np.array([0.11, 0.0, 0.0]), rot=np.zeros(3))
    f = 458.0
    nl = bearings(pts_l) + rng.normal(size=(100, 3)) * (0.5 / f)
    nr = bearings(pts_r) + rng.normal(size=(100, 3)) * (0.5 / f)
    out = np.array(triangulate_midpoint(
        jnp.asarray(T_lr)[None], jnp.asarray(bearings(np.asarray(nl))),
        jnp.asarray(bearings(np.asarray(nr)))))
    med = np.median(np.linalg.norm(out - pts_l, axis=-1))
    # expected depth sigma ≈ z²/(f·b)·σ_px ≈ 8²/(458·0.11)·0.5 ≈ 0.63 m at
    # the median depth of this scene — check we're in that ballpark.
    assert med < 1.0


def test_reprojection_checks(rng):
    pts_l, pts_r, T_lr = make_scene(rng, n=50)
    ok = reprojection_checks(
        jnp.asarray(T_lr), jnp.asarray(bearings(pts_l)),
        jnp.asarray(bearings(pts_r)), jnp.asarray(pts_l),
        fx=458.0, max_reproj_err=3.0)
    assert np.array(ok).all()
    # behind-camera points rejected
    bad = pts_l.copy()
    bad[:, 2] *= -1
    ok = reprojection_checks(
        jnp.asarray(T_lr), jnp.asarray(bearings(pts_l)),
        jnp.asarray(bearings(pts_r)), jnp.asarray(bad),
        fx=458.0, max_reproj_err=3.0)
    assert not np.array(ok).any()


# -------------------------------------------------------------------- P3P #

def test_p3p_recovers_pose(rng):
    for _ in range(10):
        T_wc = np.concatenate(
            [np.array(lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.5))),
             rng.normal(size=3) * 2])
        pc = rng.uniform([-1, -1, 3], [1, 1, 9], size=(3, 3))
        Pw = np.array(lie.pose_apply(jnp.asarray(T_wc), jnp.asarray(pc)))
        poses, valid = p3p_kneip(
            jnp.asarray(bearings(pc))[None], jnp.asarray(Pw)[None])
        poses, valid = np.array(poses[0]), np.array(valid[0])
        errs = [
            float(lie.pose_distance(jnp.asarray(poses[i]),
                                    jnp.asarray(T_wc))[1])
            for i in range(4) if valid[i]
        ]
        assert errs and min(errs) < 1e-6


def test_p3p_ransac_with_outliers(rng):
    fx = fy = 458.0
    cx, cy = 376.0, 240.0
    T_wc = np.concatenate(
        [np.array(lie.so3_exp(jnp.asarray(np.array([0.1, -0.2, 0.05])))),
         np.array([0.5, -0.3, 0.2])])
    N = 128
    pc = rng.uniform([-1.5, -1.5, 3], [1.5, 1.5, 10], size=(N, 3))
    Pw = np.array(lie.pose_apply(jnp.asarray(T_wc), jnp.asarray(pc)))
    px = np.stack([pc[:, 0] / pc[:, 2] * fx + cx,
                   pc[:, 1] / pc[:, 2] * fy + cy], -1)
    bv = bearings(pc)
    # corrupt 30% with wrong associations
    n_out = int(0.3 * N)
    out_idx = rng.choice(N, n_out, replace=False)
    Pw_corr = Pw.copy()
    Pw_corr[out_idx] = rng.uniform([-3, -3, 1], [3, 3, 12], size=(n_out, 3))
    valid = np.ones(N, bool)

    T_best, inl, n = p3p_ransac(
        jax.random.PRNGKey(0), jnp.asarray(bv), jnp.asarray(Pw_corr),
        jnp.asarray(px), jnp.asarray(valid), fx, fy, cx, cy,
        err_th=3.0, n_iters=100)
    rot_err, t_err = lie.pose_distance(T_best, jnp.asarray(T_wc))
    assert float(t_err) < 0.02 and float(rot_err) < 0.005
    inl = np.array(inl)
    assert inl[~np.isin(np.arange(N), out_idx)].mean() > 0.95
    assert int(n) >= N - n_out - 5


def test_p3p_lmeds(rng):
    fx = fy = 458.0
    cx, cy = 376.0, 240.0
    T_wc = np.concatenate(
        [np.array(lie.so3_exp(jnp.asarray(np.array([-0.05, 0.1, 0.2])))),
         np.array([1.0, 0.2, -0.4])])
    N = 96
    pc = rng.uniform([-1.5, -1.5, 3], [1.5, 1.5, 10], size=(N, 3))
    Pw = np.array(lie.pose_apply(jnp.asarray(T_wc), jnp.asarray(pc)))
    px = np.stack([pc[:, 0] / pc[:, 2] * fx + cx,
                   pc[:, 1] / pc[:, 2] * fy + cy], -1)
    T_best, inl, n = p3p_lmeds(
        jax.random.PRNGKey(1), jnp.asarray(bearings(pc)), jnp.asarray(Pw),
        jnp.asarray(px), jnp.ones(N, bool), fx, fy, cx, cy,
        err_th=3.0, n_iters=100)
    _, t_err = lie.pose_distance(T_best, jnp.asarray(T_wc))
    assert float(t_err) < 0.01


# -------------------------------------------------------------- essential #

def test_essential_from_pose_epipolar_constraint(rng):
    pts_l, pts_r, T_lr = make_scene(rng)
    E = essential_from_pose(jnp.asarray(T_lr))
    xl = pts_l[:, :2] / pts_l[:, 2:]
    xr = pts_r[:, :2] / pts_r[:, 2:]
    d2 = sampson_dist_sq(E, jnp.asarray(xl), jnp.asarray(xr))
    assert float(jnp.max(d2)) < 1e-16


def test_eight_point_exact(rng):
    pts_l, pts_r, T_lr = make_scene(rng, n=24)
    xl = pts_l[:, :2] / pts_l[:, 2:]
    xr = pts_r[:, :2] / pts_r[:, 2:]
    E = eight_point(jnp.asarray(xl)[None], jnp.asarray(xr)[None])[0]
    d2 = sampson_dist_sq(E, jnp.asarray(xl), jnp.asarray(xr))
    assert float(jnp.max(d2)) < 1e-12


def test_essential_ransac_and_decompose(rng):
    pts_l, pts_r, T_lr = make_scene(rng, n=200)
    xl = pts_l[:, :2] / pts_l[:, 2:]
    xr = pts_r[:, :2] / pts_r[:, 2:]
    # 25% outliers
    xr_c = xr.copy()
    out_idx = rng.choice(200, 50, replace=False)
    xr_c[out_idx] += rng.normal(size=(50, 2)) * 0.2
    T_est, inl, n = relative_pose_ransac(
        jax.random.PRNGKey(2), jnp.asarray(xl), jnp.asarray(xr_c),
        jnp.ones(200, bool), focal=458.0, err_th_px=1.0, n_iters=100)
    assert int(n) > 120
    # direction of translation + rotation must match (scale is free)
    t_est = np.array(lie.pose_t(T_est))
    t_true = T_lr[4:7]
    cos = np.dot(t_est, t_true) / (
        np.linalg.norm(t_est) * np.linalg.norm(t_true))
    assert cos > 0.999
    rot_err = float(lie.pose_distance(
        lie.make_pose(lie.pose_q(T_est), jnp.zeros(3)),
        lie.make_pose(jnp.asarray(T_lr[:4]), jnp.zeros(3)))[0])
    assert rot_err < 0.01


# --------------------------------------------------------------- 5-point #

def test_five_point_exact_general(rng):
    from ov2slam_tpu.geometry.essential import five_point
    pts_l, pts_r, T_lr = make_scene(rng, n=5)
    xl = pts_l[:, :2] / pts_l[:, 2:]
    xr = pts_r[:, :2] / pts_r[:, 2:]
    Es, valid = five_point(jnp.asarray(xl, jnp.float32),
                           jnp.asarray(xr, jnp.float32))
    E_gt = np.array(essential_from_pose(jnp.asarray(T_lr)))
    E_gt /= np.linalg.norm(E_gt)
    Es, valid = np.array(Es), np.array(valid)
    assert valid.sum() >= 1
    errs = [min(np.abs(Es[i] - E_gt).max(), np.abs(Es[i] + E_gt).max())
            for i in range(10) if valid[i]]
    assert min(errs) < 1e-4


def test_five_point_planar_outlier_gate(rng):
    """Planar scene (wall) + gross outliers: the epipolar gate must keep
    true correspondences and reject outliers. (Exact pose recovery from a
    single plane is fundamentally two-fold ambiguous — what the front-end
    needs from this RANSAC on EuRoC's wall-dominated V-rooms is outlier
    DISCRIMINATION, `visual_front_end.cpp:446-656`.)"""
    xy = rng.uniform(-2, 2, size=(80, 2))
    z = 4.0 + 0.2 * xy[:, 0] + 0.1 * xy[:, 1]
    pts_l = np.concatenate([xy, z[:, None]], axis=1)
    T_lr = np.concatenate(
        [np.array(lie.so3_exp(jnp.array([0.04, -0.09, 0.02]))),
         np.array([0.35, 0.05, -0.08])])
    M_rl = np.array(lie.pose_to_matrix(lie.pose_inverse(jnp.asarray(T_lr))))
    pts_r = (M_rl[:3, :3] @ pts_l.T).T + M_rl[:3, 3]
    focal = 458.0
    xl = (pts_l[:, :2] / pts_l[:, 2:]).astype(np.float32)
    xr = (pts_r[:, :2] / pts_r[:, 2:]).astype(np.float32)
    xl += rng.normal(size=xl.shape).astype(np.float32) * (0.3 / focal)
    xr += rng.normal(size=xr.shape).astype(np.float32) * (0.3 / focal)
    # 20 gross outliers
    out_idx = rng.choice(80, 20, replace=False)
    xr_c = xr.copy()
    xr_c[out_idx] += rng.normal(size=(20, 2)).astype(np.float32) * 0.15

    _, inl, n = essential_ransac(
        jax.random.PRNGKey(5), jnp.asarray(xl), jnp.asarray(xr_c),
        jnp.ones(80, bool), focal=focal, err_th_px=1.5, n_iters=100)
    inl = np.array(inl)
    is_out = np.zeros(80, bool)
    is_out[out_idx] = True
    assert inl[~is_out].mean() > 0.9      # keeps >=90% of true matches
    assert inl[is_out].mean() < 0.15      # admits <15% of outliers


def test_five_point_in_ransac_beats_pure_eight_point_on_plane(rng):
    """Same planar scene: hypotheses from the 8-point pool alone misfit
    badly, documenting why the 5-point path exists."""
    xy = rng.uniform(-2, 2, size=(60, 2))
    pts_l = np.concatenate([xy, np.full((60, 1), 5.0)], axis=1)
    T_lr = np.concatenate(
        [np.array(lie.so3_exp(jnp.array([0.0, -0.06, 0.0]))),
         np.array([0.4, 0.0, 0.0])])
    M_rl = np.array(lie.pose_to_matrix(lie.pose_inverse(jnp.asarray(T_lr))))
    pts_r = (M_rl[:3, :3] @ pts_l.T).T + M_rl[:3, 3]
    focal = 458.0
    xl = (pts_l[:, :2] / pts_l[:, 2:]).astype(np.float32)
    xr = (pts_r[:, :2] / pts_r[:, 2:]).astype(np.float32)
    xl += rng.normal(size=xl.shape).astype(np.float32) * (0.4 / focal)
    xr += rng.normal(size=xr.shape).astype(np.float32) * (0.4 / focal)

    # pure 8-point hypotheses
    idx = rng.integers(0, 60, size=(100, 8))
    E8 = eight_point(jnp.asarray(xl)[idx], jnp.asarray(xr)[idx])
    from ov2slam_tpu.geometry.essential import five_point
    idx5 = rng.integers(0, 60, size=(100, 5))
    E5, v5 = jax.vmap(five_point)(jnp.asarray(xl)[idx5],
                                  jnp.asarray(xr)[idx5])

    E_gt = np.array(essential_from_pose(jnp.asarray(T_lr)))
    E_gt /= np.linalg.norm(E_gt)

    def best_err(Es, valid=None):
        Es = np.asarray(Es).reshape(-1, 3, 3)
        v = (np.ones(len(Es), bool) if valid is None
             else np.asarray(valid).reshape(-1))
        errs = []
        for i in range(len(Es)):
            if not v[i] or not np.isfinite(Es[i]).all():
                continue
            e = Es[i] / np.linalg.norm(Es[i])
            errs.append(min(np.abs(e - E_gt).max(), np.abs(e + E_gt).max()))
        return min(errs)

    err8 = best_err(E8)
    err5 = best_err(E5, v5)
    assert err5 < 0.05              # 5-pt nails it
    assert err5 < 0.5 * err8        # 8-pt pool is much worse on the plane
