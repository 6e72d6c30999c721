"""Camera models — TPU-native replacement for `CameraCalibration`
(`include/camera_calibration.hpp:44-125`, `src/camera_calibration.cpp`).

Supports the reference's two models (`camera_calibration.hpp:49-52`):
- ``pinhole``: radtan distortion [k1 k2 p1 p2]
- ``fisheye``: Kannala–Brandt equidistant-4 [k1 k2 k3 k4]

All projection/undistortion functions are pure, batched over leading dims,
and jit-safe. Undistortion is folded into a precomputed remap LUT exactly
like the reference (`camera_calibration.cpp:80-133` setUndistMap: build
rectify maps then zero out D), so the hot path does one bilinear remap.

Stereo rectification (`ov2slam.cpp:343-426` setupStereoCalibration →
cv::stereoRectify) is re-derived here from first principles: rotate both
cameras onto a common frame whose x-axis is the baseline, pick a shared
intrinsic K_new, and emit per-camera remap LUTs + the rectified extrinsics.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import lie
from ..utils.config import CameraConfig


# --------------------------------------------------------------------------
# Distortion models (batched, jit-safe)
# --------------------------------------------------------------------------

def distort_radtan(xn, dist):
    """Apply radtan distortion to normalized coords (..., 2)."""
    k1, k2, p1, p2 = dist[0], dist[1], dist[2], dist[3]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def distort_fisheye(xn, dist):
    """Kannala–Brandt equidistant-4 distortion on normalized coords."""
    k1, k2, k3, k4 = dist[0], dist[1], dist[2], dist[3]
    x, y = xn[..., 0], xn[..., 1]
    r = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-18))
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1 + k1 * t2 + k2 * t2**2 + k3 * t2**3 + k4 * t2**4)
    scale = theta_d / r
    return jnp.stack([x * scale, y * scale], axis=-1)


def _undistort_iterative(xd, dist, distort_fn, iters: int = 8):
    """Fixed-point inversion of a distortion model (jit-safe, fixed iters).

    The reference uses cv::undistortPoints' iterative solver; 8 iterations
    matches its default tolerance for typical SLAM lenses.
    """
    def body(_, xn):
        delta = distort_fn(xn, dist) - xn
        return xd - delta

    return jax.lax.fori_loop(0, iters, body, xd)


# --------------------------------------------------------------------------
# Camera
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Camera:
    """Immutable calibrated camera. Device-resident parameters.

    ``T_c0_ci`` is the extrinsic: this-camera pose in camera-0 frame,
    derived from the YAML ``body_T_cam{i}`` pair like `ov2slam.cpp:328-341`
    (Tc0ci = Tbc0⁻¹ * Tbci).
    """

    model: str                      # "pinhole" | "fisheye"
    width: int
    height: int
    K: jnp.ndarray                  # (3, 3)
    dist: jnp.ndarray               # (4,)
    T_c0_ci: jnp.ndarray            # (7,) pose of cam i in cam0 frame

    # Precomputed undistort remap LUT (maps undistorted px -> distorted px),
    # or None when dist == 0 (`camera_calibration.cpp:84-90`).
    undist_map: Optional[jnp.ndarray] = None   # (H, W, 2) xy

    @property
    def fx(self):
        return self.K[0, 0]

    @property
    def fy(self):
        return self.K[1, 1]

    @property
    def cx(self):
        return self.K[0, 2]

    @property
    def cy(self):
        return self.K[1, 2]

    @property
    def intrinsics_f(self) -> Tuple[float, float, float, float]:
        """(fx, fy, cx, cy) as HOST Python floats, cached after one
        readback. `float(cam.fx)` forces a device->host scalar transfer
        (~30 ms per scalar over a tunneled remote chip); per-frame host
        code must use this instead."""
        c = getattr(self, "_intr_cache", None)
        if c is None:
            K = np.asarray(self.K)
            c = (float(K[0, 0]), float(K[1, 1]),
                 float(K[0, 2]), float(K[1, 2]))
            object.__setattr__(self, "_intr_cache", c)
        return c

    # -- projections ----------------------------------------------------- #

    def project_cam_to_image(self, pts_cam):
        """3D cam-frame points (..., 3) → *undistorted* pixel coords (..., 2).

        Mirrors `projectCamToImage` (`camera_calibration.cpp:257-270`):
        after undistortion LUTs are active, K maps normalized → pixels.
        """
        z = pts_cam[..., 2:3]
        xn = pts_cam[..., 0:2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        return xn * jnp.stack([self.fx, self.fy]) + jnp.stack(
            [self.cx, self.cy])

    def project_cam_to_image_dist(self, pts_cam):
        """3D cam points → *distorted* (raw-image) pixels
        (`projectCamToImageDist`, `camera_calibration.cpp:272-297`)."""
        z = pts_cam[..., 2:3]
        xn = pts_cam[..., 0:2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        fn = distort_fisheye if self.model == "fisheye" else distort_radtan
        xd = fn(xn, self.dist)
        return xd * jnp.stack([self.fx, self.fy]) + jnp.stack(
            [self.cx, self.cy])

    def undistort_px(self, px):
        """Distorted pixels (..., 2) → undistorted pixels
        (`undistortImagePoint`, `camera_calibration.cpp:299-318`)."""
        xn = (px - jnp.stack([self.cx, self.cy])) / jnp.stack(
            [self.fx, self.fy])
        fn = distort_fisheye if self.model == "fisheye" else distort_radtan
        xu = _undistort_iterative(xn, self.dist, fn)
        return xu * jnp.stack([self.fx, self.fy]) + jnp.stack(
            [self.cx, self.cy])

    def bearing(self, px_undist):
        """Undistorted pixels → unit bearing vectors (..., 3)
        (Keypoint.bv_, `frame.hpp:74`; computed in `frame.cpp` addKeypoint)."""
        xn = (px_undist - jnp.stack([self.cx, self.cy])) / jnp.stack(
            [self.fx, self.fy])
        v = jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], axis=-1)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    def in_image(self, px, border: float = 0.0):
        return (
            (px[..., 0] >= border)
            & (px[..., 0] <= self.width - 1 - border)
            & (px[..., 1] >= border)
            & (px[..., 1] <= self.height - 1 - border)
        )

    # -- image undistortion ---------------------------------------------- #

    def rectify_image(self, img):
        """Bilinear remap through the undistortion LUT
        (`rectifyImage` = cv::remap, `camera_calibration.cpp:233-241`)."""
        if self.undist_map is None:
            return img
        return bilinear_sample(img, self.undist_map)


def build_camera(cfg: CameraConfig, other: Optional[CameraConfig] = None,
                 build_undist_map: bool = False,
                 dtype=jnp.float32) -> Camera:
    """Construct a Camera from config; computes T_c0_ci from body extrinsics."""
    K = jnp.array(
        [[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1]], dtype=dtype)
    dist = jnp.array(cfg.dist, dtype=dtype)
    if other is not None and cfg.T_body_cam is not None \
            and other.T_body_cam is not None:
        T_b_ci = lie.pose_from_matrix(jnp.asarray(cfg.T_body_cam, dtype))
        T_b_c0 = lie.pose_from_matrix(jnp.asarray(other.T_body_cam, dtype))
        T_c0_ci = lie.pose_relative(T_b_c0, T_b_ci)
    else:
        T_c0_ci = lie.pose_identity(dtype)
    cam = Camera(model=cfg.model, width=cfg.width, height=cfg.height,
                 K=K, dist=dist, T_c0_ci=T_c0_ci)
    if build_undist_map and bool(np.any(np.asarray(cfg.dist))):
        cam = dataclasses.replace(cam, undist_map=compute_undist_map(cam))
    return cam


def compute_undist_map(cam: Camera) -> jnp.ndarray:
    """LUT mapping each *undistorted* output pixel to its source position in
    the distorted input image (`setUndistMap`, `camera_calibration.cpp:80-133`:
    initUndistortRectifyMap semantics — forward distortion of the output grid)."""
    ys, xs = jnp.meshgrid(
        jnp.arange(cam.height, dtype=cam.K.dtype),
        jnp.arange(cam.width, dtype=cam.K.dtype),
        indexing="ij",
    )
    px = jnp.stack([xs, ys], axis=-1)  # (H, W, 2) undistorted px grid
    xn = (px - jnp.stack([cam.cx, cam.cy])) / jnp.stack([cam.fx, cam.fy])
    fn = distort_fisheye if cam.model == "fisheye" else distort_radtan
    xd = fn(xn, cam.dist)
    return xd * jnp.stack([cam.fx, cam.fy]) + jnp.stack([cam.cx, cam.cy])


# --------------------------------------------------------------------------
# Bilinear sampling (shared by remap, KLT, BRIEF)
# --------------------------------------------------------------------------

def bilinear_sample(img, coords, out_of_bounds: float = 0.0):
    """Sample ``img`` (H, W) at ``coords`` (..., 2) xy with bilinear interp.

    Out-of-bounds samples return ``out_of_bounds``. This is the single
    gather primitive underlying image remap, KLT patch extraction, and
    BRIEF sampling; XLA lowers it to efficient TPU gathers.
    """
    H, W = img.shape[-2], img.shape[-1]
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        return img[..., yc, xc]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    val = (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
    valid = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    return jnp.where(valid, val, out_of_bounds)


# --------------------------------------------------------------------------
# Stereo rectification
# --------------------------------------------------------------------------

def stereo_rectify(
    cam_l: Camera, cam_r: Camera
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """Compute rectifying rotations and shared intrinsics for a stereo pair.

    Re-derivation of cv::stereoRectify as used by `ov2slam.cpp:343-426`:
    returns (R_rect_l (3,3), R_rect_r (3,3), K_new (3,3), baseline).
    After rectification the right camera sits at [-b, 0, 0] in the left
    rectified frame and epipolar lines are horizontal.
    """
    T_lr = np.array(cam_r.T_c0_ci, np.float64)  # right-in-left
    R_lr = np.array(lie.quat_to_matrix(T_lr[0:4]))
    t_lr = T_lr[4:7]

    # New shared orientation A (rows = new axes expressed in left frame):
    # x along the baseline so the right camera lands at [+b, 0, 0], y chosen
    # to stay close to the left camera's image-down axis, z = x × y.
    e1 = t_lr / np.linalg.norm(t_lr)
    e2 = np.cross(np.array([0.0, 0.0, 1.0]), e1)
    e2 /= np.linalg.norm(e2)
    e3 = np.cross(e1, e2)
    R_rect_l = np.stack([e1, e2, e3], axis=0)
    # x_rect_r = (A @ R_lr) x_r  shares orientation with x_rect_l = A x_l.
    R_rect_r = R_rect_l @ R_lr

    baseline = float(np.linalg.norm(t_lr))
    K_new = 0.5 * (np.array(cam_l.K, np.float64) + np.array(cam_r.K, np.float64))
    K_new[0, 1] = 0.0
    return R_rect_l, R_rect_r, K_new, baseline


def compute_rectify_map(cam: Camera, R_rect: np.ndarray,
                        K_new: np.ndarray) -> jnp.ndarray:
    """Remap LUT: rectified output pixel → raw input pixel, folding
    rectifying rotation + distortion (setUndistStereoMap,
    `camera_calibration.cpp:134-194`)."""
    dtype = cam.K.dtype
    ys, xs = jnp.meshgrid(
        jnp.arange(cam.height, dtype=dtype),
        jnp.arange(cam.width, dtype=dtype), indexing="ij")
    K_new = jnp.asarray(K_new, dtype)
    xn = jnp.stack(
        [(xs - K_new[0, 2]) / K_new[0, 0], (ys - K_new[1, 2]) / K_new[1, 1],
         jnp.ones_like(xs)], axis=-1)
    # rotate back into the raw camera frame
    Rinv = jnp.asarray(R_rect, dtype).T
    v = xn @ Rinv.T
    xn_raw = v[..., 0:2] / v[..., 2:3]
    fn = distort_fisheye if cam.model == "fisheye" else distort_radtan
    xd = fn(xn_raw, cam.dist)
    return xd * jnp.stack([cam.fx, cam.fy]) + jnp.stack([cam.cx, cam.cy])
