"""Synthetic ground-truthed sequences for tests and benchmarks.

The reference verifies itself only by replaying EuRoC rosbags
(`benchmark_scripts/euroc_bench.sh`); no dataset ships with this
environment, so we render deterministic synthetic sequences with exact
ground truth instead: a 3D "star field" of Gaussian splats observed by a
camera on a smooth trajectory. Texture-rich, full parallax, works for
mono and stereo, and ATE against ground truth is exact.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from ..utils import lie_np as lie
from ..utils.config import CameraConfig, SlamConfig


def make_patterns(n_points: int, seed: int = 1234,
                  size: int = 9) -> np.ndarray:
    """Per-landmark appearance patterns: smoothed random patches, so each
    feature has a *distinctive* local appearance (required for descriptor
    matching / place recognition to be meaningful — identical Gaussian
    blobs make every BRIEF descriptor ambiguous)."""
    rng = np.random.default_rng(seed)
    pats = rng.uniform(-1.0, 1.0, size=(n_points, size, size)).astype(
        np.float32)
    # light smoothing so subpixel bilinear placement stays consistent
    k = np.array([0.25, 0.5, 0.25], np.float32)
    pats = np.apply_along_axis(
        lambda m: np.convolve(m, k, mode="same"), 1, pats)
    pats = np.apply_along_axis(
        lambda m: np.convolve(m, k, mode="same"), 2, pats)
    # taper edges to zero to avoid splat seams
    w1 = np.hanning(size + 2)[1:-1].astype(np.float32)
    pats *= w1[None, :, None] * w1[None, None, :]
    return pats


def render_splats(
    points_cam: np.ndarray,
    intensities: np.ndarray,
    K: np.ndarray,
    width: int,
    height: int,
    patterns: Optional[np.ndarray] = None,
    background: float = 40.0,
) -> np.ndarray:
    """Render 3D points (camera frame) as textured splats. Returns (H, W) f32.

    Subpixel-accurate: each point's pattern is bilinearly placed at its
    projected (float) pixel position, so KLT can recover subpixel motion
    and each feature keeps a distinctive appearance across frames.
    """
    img = np.full((height, width), background, np.float32)
    z = points_cam[:, 2]
    vis_mask = z > 0.3
    vis = np.nonzero(vis_mask)[0]
    pts = points_cam[vis]
    inten = intensities[vis]
    u = pts[:, 0] / pts[:, 2] * K[0, 0] + K[0, 2]
    v = pts[:, 1] / pts[:, 2] * K[1, 1] + K[1, 2]
    S = 9 if patterns is None else patterns.shape[1]
    half = S // 2 + 1
    inb = (u >= half) & (u < width - half) & (v >= half) & (v < height - half)
    vis, u, v, inten = vis[inb], u[inb], v[inb], inten[inb]

    if patterns is None:
        patterns_sel = make_patterns(1, size=S)[np.zeros(len(vis), int)]
    else:
        patterns_sel = patterns[vis]

    iu = np.floor(u).astype(np.int32)
    iv = np.floor(v).astype(np.int32)
    fu = (u - iu).astype(np.float32)
    fv = (v - iv).astype(np.float32)

    # bilinear placement: pad pattern to (S+1, S+1) and mix 4 shifts
    P = patterns_sel * inten[:, None, None].astype(np.float32)
    padded = np.zeros((len(vis), S + 1, S + 1), np.float32)
    w00 = ((1 - fu) * (1 - fv))[:, None, None]
    w01 = (fu * (1 - fv))[:, None, None]
    w10 = ((1 - fu) * fv)[:, None, None]
    w11 = (fu * fv)[:, None, None]
    padded[:, :S, :S] += w00 * P
    padded[:, :S, 1:] += w01 * P
    padded[:, 1:, :S] += w10 * P
    padded[:, 1:, 1:] += w11 * P

    off = np.arange(S + 1)
    oy, ox = np.meshgrid(off, off, indexing="ij")
    ys = (iv[:, None, None] - S // 2 + oy[None]).reshape(-1)
    xs = (iu[:, None, None] - S // 2 + ox[None]).reshape(-1)
    np.add.at(img, (ys, xs), padded.reshape(-1))
    return np.clip(img, 0.0, 255.0)


@dataclasses.dataclass
class SyntheticSequence:
    """A rendered sequence with exact ground truth."""

    times: np.ndarray                # (F,)
    gt_poses: np.ndarray             # (F, 7) T_wc (left cam in world)
    images_left: List[np.ndarray]
    images_right: Optional[List[np.ndarray]]
    K: np.ndarray                    # (3, 3)
    T_lr: Optional[np.ndarray]       # (7,) right-in-left extrinsic
    points: np.ndarray               # (P, 3) world landmarks
    width: int
    height: int

    @property
    def stereo(self) -> bool:
        return self.images_right is not None

    def camera_config(self) -> Tuple[CameraConfig, Optional[CameraConfig]]:
        left = CameraConfig(
            model="pinhole", width=self.width, height=self.height,
            fx=float(self.K[0, 0]), fy=float(self.K[1, 1]),
            cx=float(self.K[0, 2]), cy=float(self.K[1, 2]),
            dist=(0.0, 0.0, 0.0, 0.0),
            T_body_cam=np.eye(4))
        right = None
        if self.T_lr is not None:
            M = np.array(lie.pose_to_matrix(self.T_lr))
            right = CameraConfig(
                model="pinhole", width=self.width, height=self.height,
                fx=float(self.K[0, 0]), fy=float(self.K[1, 1]),
                cx=float(self.K[0, 2]), cy=float(self.K[1, 2]),
                dist=(0.0, 0.0, 0.0, 0.0),
                T_body_cam=M)
        return left, right

    def make_config(self, **overrides) -> SlamConfig:
        left, right = self.camera_config()
        cfg = SlamConfig(
            mono=not self.stereo, stereo=self.stereo,
            cam_left=left, cam_right=right)
        for k, v in overrides.items():
            setattr(cfg, k, v)
        return cfg.validate()


def make_trajectory(n_frames: int, kind: str = "arc",
                    speed: float = 0.04) -> np.ndarray:
    """Smooth camera trajectory (F, 7), z forward, starting at origin."""
    poses = []
    for i in range(n_frames):
        s = i * speed
        if kind == "arc":
            t = np.array([0.6 * np.sin(0.3 * s), 0.15 * np.sin(0.2 * s), s])
            yaw = 0.08 * np.sin(0.25 * s)
            pitch = 0.04 * np.sin(0.2 * s + 1.0)
            q = np.array(lie.quat_mul(
                lie.so3_exp(np.array([0.0, yaw, 0.0])),
                lie.so3_exp(np.array([pitch, 0.0, 0.0]))))
        elif kind == "forward":
            t = np.array([0.0, 0.0, s])
            q = np.array([1.0, 0, 0, 0])
        elif kind == "loop":
            # closed circular loop in xz-plane, camera looking along motion
            r = n_frames * speed / (2 * np.pi)
            a = s / r
            t = np.array([r * np.sin(a), 0.0, r * (1 - np.cos(a))])
            q = np.array(lie.so3_exp(np.array([0.0, a, 0.0])))
        else:
            raise ValueError(kind)
        poses.append(np.concatenate([q, t]))
    return np.stack(poses).astype(np.float64)


def generate_sequence(
    n_frames: int = 30,
    stereo: bool = True,
    width: int = 752,
    height: int = 480,
    n_points: int = 6000,
    seed: int = 0,
    kind: str = "arc",
    speed: float = 0.04,
    baseline: float = 0.11,
    fps: float = 20.0,
) -> SyntheticSequence:
    rng = np.random.default_rng(seed)
    K = np.array([[458.0, 0.0, width / 2], [0.0, 458.0, height / 2],
                  [0.0, 0.0, 1.0]])
    gt = make_trajectory(n_frames, kind=kind, speed=speed)

    # landmarks in a thick shell around the whole trajectory
    traj_span = gt[:, 4:7]
    lo = traj_span.min(0) - np.array([8.0, 5.0, 4.0])
    hi = traj_span.max(0) + np.array([8.0, 5.0, 14.0])
    points = rng.uniform(lo, hi, size=(n_points, 3))
    inten = rng.uniform(60.0, 200.0, size=n_points)
    patterns = make_patterns(n_points, seed=seed + 1)

    T_lr = None
    if stereo:
        T_lr = np.concatenate(
            [[1.0, 0, 0, 0], [baseline, 0.0, 0.0]]).astype(np.float64)

    imgs_l, imgs_r = [], [] if stereo else None
    for i in range(n_frames):
        T_wc = gt[i]
        M_cw = np.array(lie.pose_to_matrix(lie.pose_inverse(T_wc)))
        pc = (M_cw[:3, :3] @ points.T).T + M_cw[:3, 3]
        imgs_l.append(render_splats(pc, inten, K, width, height,
                                    patterns=patterns))
        if stereo:
            M_rl = np.array(lie.pose_to_matrix(lie.pose_inverse(T_lr)))
            pr = (M_rl[:3, :3] @ pc.T).T + M_rl[:3, 3]
            imgs_r.append(render_splats(pr, inten, K, width, height,
                                        patterns=patterns))

    return SyntheticSequence(
        times=np.arange(n_frames) / fps,
        gt_poses=gt,
        images_left=imgs_l,
        images_right=imgs_r,
        K=K, T_lr=T_lr, points=points, width=width, height=height)
