import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ov2slam_tpu.core.camera import (
    Camera, bilinear_sample, build_camera, compute_rectify_map,
    compute_undist_map, stereo_rectify,
)
from ov2slam_tpu.utils import lie
from ov2slam_tpu.utils.config import load_config

REF_YAML = "/root/reference/parameters_files/fast/euroc/euroc_stereo.yaml"


@pytest.fixture
def euroc_cams():
    cfg = load_config(REF_YAML)
    cam_l = build_camera(cfg.cam_left, other=cfg.cam_left, dtype=jnp.float64)
    cam_r = build_camera(cfg.cam_right, other=cfg.cam_left, dtype=jnp.float64)
    return cam_l, cam_r


def test_project_unproject_roundtrip(euroc_cams, rng):
    cam, _ = euroc_cams
    pts = rng.uniform([-1, -1, 2], [1, 1, 8], size=(200, 3))
    px = cam.project_cam_to_image(jnp.asarray(pts))
    # bearing of undistorted px should match point direction
    bv = cam.bearing(px)
    dirs = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.array(bv), dirs, atol=1e-9)


def test_distort_undistort_roundtrip(euroc_cams, rng):
    cam, _ = euroc_cams
    pts = rng.uniform([-0.5, -0.5, 3], [0.5, 0.5, 8], size=(200, 3))
    px_dist = cam.project_cam_to_image_dist(jnp.asarray(pts))
    px_undist = cam.undistort_px(px_dist)
    px_expected = cam.project_cam_to_image(jnp.asarray(pts))
    np.testing.assert_allclose(np.array(px_undist), np.array(px_expected),
                               atol=1e-6)


def test_fisheye_distort_undistort(rng):
    cam = Camera(
        model="fisheye", width=640, height=480,
        K=jnp.array([[380.0, 0, 320], [0, 380.0, 240], [0, 0, 1]],
                    jnp.float64),
        dist=jnp.array([0.1, -0.05, 0.01, -0.002], jnp.float64),
        T_c0_ci=lie.pose_identity(jnp.float64))
    pts = rng.uniform([-0.6, -0.6, 2], [0.6, 0.6, 6], size=(100, 3))
    px_dist = cam.project_cam_to_image_dist(jnp.asarray(pts))
    px_undist = cam.undistort_px(px_dist)
    np.testing.assert_allclose(
        np.array(px_undist), np.array(cam.project_cam_to_image(jnp.asarray(pts))),
        atol=1e-6)


def test_stereo_extrinsics(euroc_cams):
    cam_l, cam_r = euroc_cams
    # EuRoC baseline is ~11 cm along x
    t = np.array(lie.pose_t(cam_r.T_c0_ci))
    assert abs(np.linalg.norm(t) - 0.11) < 0.01
    assert abs(t[0]) > 0.1


def test_bilinear_sample_exact_on_grid(rng):
    img = jnp.asarray(rng.uniform(size=(32, 40)))
    ys, xs = np.meshgrid(np.arange(32), np.arange(40), indexing="ij")
    coords = jnp.asarray(np.stack([xs, ys], -1), jnp.float64)
    out = bilinear_sample(img, coords)
    np.testing.assert_allclose(np.array(out), np.array(img), atol=1e-12)
    # linear ramp interpolates exactly at half-pixels
    ramp = jnp.asarray(np.arange(40, dtype=np.float64)[None, :].repeat(32, 0))
    c = jnp.array([[5.5, 3.0], [10.25, 8.5]])
    np.testing.assert_allclose(np.array(bilinear_sample(ramp, c)),
                               [5.5, 10.25], atol=1e-12)
    # out of bounds -> 0
    assert float(bilinear_sample(img, jnp.array([-2.0, 5.0]))) == 0.0


def test_undist_map_matches_pointwise(euroc_cams):
    cam, _ = euroc_cams
    m = compute_undist_map(cam)
    assert m.shape == (480, 752, 2)
    # LUT at an undistorted pixel must equal forward distortion of it
    test_px = jnp.array([[100.0, 50.0], [400.0, 240.0], [700.0, 400.0]])
    xn = (test_px - jnp.stack([cam.cx, cam.cy])) / jnp.stack([cam.fx, cam.fy])
    from ov2slam_tpu.core.camera import distort_radtan
    expected = distort_radtan(xn, cam.dist) * jnp.stack(
        [cam.fx, cam.fy]) + jnp.stack([cam.cx, cam.cy])
    got = m[test_px[:, 1].astype(int), test_px[:, 0].astype(int)]
    np.testing.assert_allclose(np.array(got), np.array(expected), atol=1e-9)


def test_stereo_rectify_horizontal_epipolar(euroc_cams, rng):
    """After rectification, a 3D point projects to the same row in both
    rectified views, and the right camera sits at [-b,0,0]."""
    cam_l, cam_r = euroc_cams
    R_l, R_r, K_new, baseline = stereo_rectify(cam_l, cam_r)
    assert 0.1 < baseline < 0.12

    # world == left cam frame; sample points ahead of both cameras
    pts_l = rng.uniform([-1, -1, 4], [1, 1, 10], size=(50, 3))
    T_lr = np.array(cam_r.T_c0_ci)  # right cam pose in left frame
    M_rl = np.array(lie.pose_to_matrix(lie.pose_inverse(jnp.asarray(T_lr))))
    pts_r = (M_rl[:3, :3] @ pts_l.T).T + M_rl[:3, 3]

    # rectified camera frames
    prl = (R_l @ pts_l.T).T
    prr = (R_r @ pts_r.T).T
    uvl = (K_new @ (prl / prl[:, 2:3]).T).T[:, :2]
    uvr = (K_new @ (prr / prr[:, 2:3]).T).T[:, :2]
    # same row (horizontal epipolar lines)
    np.testing.assert_allclose(uvl[:, 1], uvr[:, 1], atol=1e-6)
    # positive disparity, consistent with depth: d = f*b/z
    disp = uvl[:, 0] - uvr[:, 0]
    z = prl[:, 2]
    np.testing.assert_allclose(disp, K_new[0, 0] * baseline / z, rtol=1e-6)


def test_rectify_map_shape(euroc_cams):
    cam_l, cam_r = euroc_cams
    R_l, R_r, K_new, _ = stereo_rectify(cam_l, cam_r)
    m = compute_rectify_map(cam_l, R_l, K_new)
    assert m.shape == (480, 752, 2)
    assert np.isfinite(np.array(m)).all()
