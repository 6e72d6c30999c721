"""Visualization & export — ROS-free replacement for `RosVisualizer` +
`CameraPoseVisualization` (`include/ros_visualizer.hpp:61-311`,
`src/camera_visualizer.cpp`).

The reference publishes live RViz topics (tracked-keypoint overlay image,
VO/KF trajectories, camera frustum markers, landmark point cloud). Here
the same artifacts are produced as files: PNG overlays, PLY point clouds /
trajectory line sets (loadable in MeshLab/CloudCompare/Open3D), so the
products are inspectable without any middleware.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..utils import lie_np

# kp class colors, mirroring the reference's overlay color coding
# (`ov2slam.cpp:490-512`): 3D kps green, 2D blue, retracked yellow
COLOR_3D = (0, 255, 0)
COLOR_2D = (80, 130, 255)
COLOR_BAD = (255, 60, 60)


def draw_tracks(img: np.ndarray, kps: np.ndarray, valid: np.ndarray,
                is3d: Optional[np.ndarray] = None,
                radius: int = 3) -> np.ndarray:
    """Tracked-keypoint overlay (pubTrackImage equivalent).

    img: (H, W) grayscale f32 [0,255] → returns (H, W, 3) uint8.
    """
    H, W = img.shape
    out = np.repeat(np.clip(img, 0, 255).astype(np.uint8)[:, :, None], 3, 2)
    if is3d is None:
        is3d = np.zeros(len(kps), bool)
    yy, xx = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    ring = (np.abs(yy**2 + xx**2 - radius**2) <= radius)
    ys, xs = np.nonzero(ring)
    for i in np.nonzero(valid)[0]:
        u, v = int(round(kps[i, 0])), int(round(kps[i, 1]))
        if not (radius <= u < W - radius and radius <= v < H - radius):
            continue
        color = COLOR_3D if is3d[i] else COLOR_2D
        out[v + ys - radius, u + xs - radius] = color
    return out


def save_png(img: np.ndarray, path: str):
    from PIL import Image

    if img.ndim == 2:
        img = np.clip(img, 0, 255).astype(np.uint8)
    Image.fromarray(img).save(path)


def export_ply(points: np.ndarray, path: str,
               colors: Optional[np.ndarray] = None,
               edges: Optional[np.ndarray] = None):
    """ASCII PLY writer: point cloud (+ optional uint8 colors, edges)."""
    points = np.asarray(points, np.float32)
    n = len(points)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        if edges is not None:
            f.write(f"element edge {len(edges)}\n")
            f.write("property int vertex1\nproperty int vertex2\n")
        f.write("end_header\n")
        for i in range(n):
            row = f"{points[i,0]:.5f} {points[i,1]:.5f} {points[i,2]:.5f}"
            if colors is not None:
                c = colors[i]
                row += f" {int(c[0])} {int(c[1])} {int(c[2])}"
            f.write(row + "\n")
        if edges is not None:
            for e in edges:
                f.write(f"{int(e[0])} {int(e[1])}\n")


def export_map_cloud(map_store, path: str):
    """Landmark point cloud (pubPointCloud equivalent,
    `map_manager.cpp:646-660`)."""
    sel = map_store.lm_valid & map_store.lm_is3d
    pts = map_store.lm_pos[sel]
    export_ply(pts, path)
    return int(sel.sum())


def camera_frustum_points(T_wc: np.ndarray, scale: float = 0.1) -> np.ndarray:
    """5 frustum corner points in world frame (CameraPoseVisualization
    geometry, `camera_visualizer.cpp`)."""
    corners = np.array([
        [0.0, 0.0, 0.0],
        [-1.0, -0.75, 1.5], [1.0, -0.75, 1.5],
        [1.0, 0.75, 1.5], [-1.0, 0.75, 1.5],
    ]) * scale
    return lie_np.pose_apply(np.asarray(T_wc, np.float64), corners)


_FRUSTUM_EDGES = [(0, 1), (0, 2), (0, 3), (0, 4),
                  (1, 2), (2, 3), (3, 4), (4, 1)]


def export_trajectory_ply(poses: Sequence[np.ndarray], path: str,
                          frustum_every: int = 5, scale: float = 0.1):
    """Trajectory polyline + periodic camera frustums as a PLY edge set
    (pubVisualKFs / VO marker trajectory equivalent)."""
    verts = []
    edges = []
    for i, T in enumerate(poses):
        verts.append(np.asarray(T[4:7], np.float64))
        if i > 0:
            edges.append((len(verts) - 2, len(verts) - 1))
    base = len(verts)
    for i in range(0, len(poses), max(frustum_every, 1)):
        pts = camera_frustum_points(poses[i], scale)
        off = len(verts)
        verts.extend(pts)
        edges.extend([(off + a, off + b) for a, b in _FRUSTUM_EDGES])
    export_ply(np.asarray(verts), path, edges=np.asarray(edges))
