import numpy as np
import pytest

from ov2slam_tpu.io.rgbd import (
    depth_to_points, fuse_rgbd_frames, sync_streams, voxel_downsample,
)
from ov2slam_tpu.io.viz import (
    draw_tracks, export_map_cloud, export_ply, export_trajectory_ply,
)
from ov2slam_tpu.utils import lie_np

import jax.numpy as jnp


def test_depth_to_points_roundtrip(rng):
    K = np.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]], np.float32)
    # synthetic depth image of a plane at z = 5
    depth = np.full((240, 320), 5.0, np.float32)
    pts, valid = depth_to_points(jnp.asarray(depth), jnp.asarray(K))
    pts, valid = np.array(pts), np.array(valid)
    assert valid.all()
    np.testing.assert_allclose(pts[:, 2], 5.0)
    # reproject: u = x/z*fx+cx must reproduce the pixel grid
    u = pts[:, 0] / pts[:, 2] * 400 + 160
    v = pts[:, 1] / pts[:, 2] * 400 + 120
    ys, xs = np.meshgrid(np.arange(240), np.arange(320), indexing="ij")
    np.testing.assert_allclose(u, xs.reshape(-1), atol=1e-3)
    np.testing.assert_allclose(v, ys.reshape(-1), atol=1e-3)


def test_fuse_rgbd_world_frame(rng):
    K = np.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]], np.float32)
    depth = np.full((120, 160), 2.0, np.float32)
    rgb = np.full((120, 160, 3), 128, np.uint8)
    # camera at +1m x, looking forward
    T = np.concatenate([[1, 0, 0, 0], [1.0, 0, 0]])
    pts, cols = fuse_rgbd_frames([(depth, rgb, K, T)], stride=4)
    assert len(pts) == (120 // 4) * (160 // 4)
    np.testing.assert_allclose(pts[:, 2], 2.0, atol=1e-5)
    # x shifted by camera position: world x = (u - cx)/fx * z + 1.0
    us = np.arange(0, 160, 4, dtype=np.float64)
    expected_x = ((us - 160) / 400 * 2.0).mean() + 1.0
    assert abs(pts[:, 0].mean() - expected_x) < 1e-3
    assert cols.shape == pts.shape


def test_sync_streams():
    a = np.array([0.0, 0.1, 0.2, 0.3])
    b = np.array([0.001, 0.102, 0.35])
    c = np.array([0.0, 0.1, 0.2, 0.301])
    m = sync_streams([a, b, c], tol=0.01)
    assert (0, 0, 0) in m and (1, 1, 1) in m
    assert all(len(t) == 3 for t in m)
    assert len(m) == 2  # 0.2 has no b-partner; 0.3 matches only c


def test_voxel_downsample(rng):
    pts = rng.uniform(0, 1, (1000, 3)).astype(np.float32)
    out, _ = voxel_downsample(pts, voxel=0.5)
    assert len(out) <= 8
    assert len(out) >= 4


def test_draw_tracks_and_ply(tmp_path, rng):
    img = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    kps = rng.uniform([10, 10], [150, 110], (20, 2)).astype(np.float32)
    valid = np.ones(20, bool)
    is3d = np.zeros(20, bool)
    is3d[:10] = True
    out = draw_tracks(img, kps, valid, is3d)
    assert out.shape == (120, 160, 3) and out.dtype == np.uint8
    # some green (3D) and some blue (2D) pixels present
    assert (out == np.array([0, 255, 0])).all(-1).any()
    assert (out == np.array([80, 130, 255])).all(-1).any()

    p = tmp_path / "cloud.ply"
    export_ply(rng.uniform(size=(50, 3)), str(p),
               colors=rng.integers(0, 255, (50, 3)))
    txt = p.read_text()
    assert "element vertex 50" in txt and "property uchar red" in txt

    poses = [np.concatenate([[1, 0, 0, 0], [0.1 * i, 0, 0]])
             for i in range(10)]
    p2 = tmp_path / "traj.ply"
    export_trajectory_ply(poses, str(p2), frustum_every=3)
    assert "element edge" in p2.read_text()


def test_export_html_viewer(tmp_path, rng):
    """Self-contained interactive viewer (open3d_visualize_pose role):
    one HTML file embedding trajectory/frusta/cloud data + renderer."""
    from ov2slam_tpu.io.viz import export_html_viewer

    n = 40
    poses = np.zeros((n, 7), np.float64)
    poses[:, 0] = 1.0  # identity quats
    poses[:, 4] = np.linspace(0, 3, n)
    pts = rng.normal(0, 1, (500, 3))
    out = tmp_path / "viewer.html"
    export_html_viewer(poses, pts, str(out),
                       lc_pairs=[(0, n - 1)])
    html = out.read_text()
    assert html.startswith("<!doctype html>")
    assert "SLAM_DATA" in html and "frusta" in html
    # embedded data parses back as JSON with the right cardinalities
    import json as _json
    data = _json.loads(html.split("window.SLAM_DATA=")[1]
                       .split(";</script>")[0])
    assert len(data["traj"]) == n
    assert len(data["points"]) == 500
    assert data["lc"] == [[0, n - 1]]
    assert len(data["frusta"][0]) == 5  # 5 frustum corners
    # no external resources: must be viewable offline
    assert "http" not in html.split("</title>")[1]
