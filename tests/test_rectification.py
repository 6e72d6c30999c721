"""Image-level rectification wiring in SlamManager.

The reference rectifies input images when ``bdo_stereo_rect`` is set
(`setupStereoCalibration`, `ov2slam.cpp:343-426`) or undistorts them when
``bdo_undist`` is set (`setUndistMap`, `camera_calibration.cpp:80-133`),
then runs the whole pipeline on ideal pinhole models (D = 0). These tests
check the SlamManager performs the same calibration swap and that the
resulting stereo pair is genuinely rectified.
"""

import numpy as np
import jax.numpy as jnp

from ov2slam_tpu.models.slam import SlamManager
from ov2slam_tpu.utils import lie_np
from ov2slam_tpu.utils.config import load_config

REF_YAML = "/root/reference/parameters_files/fast/euroc/euroc_stereo.yaml"


def _manager_with_rect():
    cfg = load_config(REF_YAML)
    cfg.do_stereo_rect = True
    cfg.use_loop_closer = False
    return SlamManager(cfg)


def test_stereo_rect_swaps_to_ideal_pinhole():
    sm = _manager_with_rect()
    assert sm._remap_l is not None and sm._remap_r is not None
    np.testing.assert_allclose(np.array(sm.cam_l.dist), 0.0)
    np.testing.assert_allclose(np.array(sm.cam_r.dist), 0.0)
    np.testing.assert_allclose(np.array(sm.cam_l.K), np.array(sm.cam_r.K))
    # left extrinsic = identity; right = pure baseline translation on +x
    T_lr = np.array(sm.cam_r.T_c0_ci, np.float64)
    np.testing.assert_allclose(T_lr[0:4], [1, 0, 0, 0], atol=1e-12)
    assert T_lr[4] > 0.05           # EuRoC baseline ~0.11 m
    np.testing.assert_allclose(T_lr[5:7], 0.0, atol=1e-9)


def test_stereo_rect_epipolar_rows_align(rng):
    sm = _manager_with_rect()
    pts_l = rng.uniform([-1.5, -1.0, 3.0], [1.5, 1.0, 10.0], size=(300, 3))
    # same world point seen from the right camera
    T_rl = lie_np.pose_inverse(np.array(sm.cam_r.T_c0_ci, np.float64))
    pts_r = lie_np.pose_apply(T_rl, pts_l)
    uv_l = np.array(sm.cam_l.project_cam_to_image(jnp.asarray(pts_l)))
    uv_r = np.array(sm.cam_r.project_cam_to_image(jnp.asarray(pts_r)))
    inb = ((uv_l > 5) & (uv_l < [747, 475]) &
           (uv_r > 5) & (uv_r < [747, 475])).all(-1)
    assert inb.sum() > 50
    # horizontal epipolar lines: equal v, positive disparity
    np.testing.assert_allclose(uv_l[inb, 1], uv_r[inb, 1], atol=1e-6)
    assert np.all(uv_l[inb, 0] > uv_r[inb, 0])


def test_stereo_rect_remap_runs(rng):
    sm = _manager_with_rect()
    img = rng.uniform(0, 255, (480, 752)).astype(np.float32)
    out = np.array(sm._remap_l(jnp.asarray(img)))
    assert out.shape == img.shape
    assert np.isfinite(out).all()
    out_r = np.array(sm._remap_r(jnp.asarray(img)))
    assert out_r.shape == img.shape


def test_mono_undist_swaps_distortion_off():
    cfg = load_config(REF_YAML)
    cfg.stereo = False
    cfg.mono = True
    cfg.do_undist = True
    cfg.use_loop_closer = False
    sm = SlamManager(cfg)
    assert sm._remap_l is not None
    np.testing.assert_allclose(np.array(sm.cam_l.dist), 0.0)
    img = np.linspace(0, 255, 480 * 752, dtype=np.float32).reshape(480, 752)
    out = np.array(sm._remap_l(jnp.asarray(img)))
    assert out.shape == img.shape
