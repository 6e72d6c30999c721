"""TSDF volume: projective integration, meshing, ESDF, PLY export
(voxblox tsdf_server equivalent, `launch/carla.launch:28-76`)."""

import numpy as np
import pytest

from ov2slam_tpu.mapping.tsdf import TsdfVolume
from ov2slam_tpu.utils import lie_np

K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
H, W = 96, 128


def _wall_volume(**kw):
    """Camera at origin looking +z; wall plane at z = 2.0."""
    vol = TsdfVolume(origin=np.array([-1.5, -1.5, 0.0]),
                     dims=(30, 30, 30), voxel_size=0.1,
                     truncation=0.3, **kw)
    depth = np.full((H, W), 2.0, np.float32)
    rgb = np.zeros((H, W, 3), np.float32)
    rgb[:] = (200, 50, 10)
    vol.integrate(depth, K, lie_np.pose_identity(), rgb=rgb)
    return vol


def test_integrate_zero_crossing_at_surface():
    vol = _wall_volume()
    t = np.array(vol.tsdf).reshape(vol.dims)
    w = np.array(vol.weight).reshape(vol.dims)
    # voxel column along the optical axis: x=y=0 -> ix=iy=15
    col_t, col_w = t[15, 15], w[15, 15]
    zs = vol.origin[2] + (np.arange(30) + 0.5) * vol.voxel_size
    seen = col_w > 0
    # in front of the wall (within trunc) positive, behind negative
    near = seen & (np.abs(zs - 2.0) < 0.25)
    assert near.sum() >= 3
    assert np.all(np.sign(col_t[near]) == np.sign(2.0 - zs[near]))
    # far in front: not updated beyond min_ray=0.5 only; tsdf ~ +1 at
    # z = 1.5 (exactly at +trunc boundary or clamped)
    assert col_t[seen & (zs < 1.6)].min() > 0.9


def test_surface_points_and_color():
    vol = _wall_volume()
    pts, cols = vol.extract_surface_points()
    assert len(pts) > 50
    assert np.abs(pts[:, 2] - 2.0).max() < 1.5 * vol.voxel_size
    assert cols is not None
    assert np.all(np.abs(cols.astype(int) - [200, 50, 10]) <= 2)


def test_mesh_lies_on_surface(tmp_path):
    vol = _wall_volume()
    verts, faces, cols = vol.extract_mesh()
    assert len(verts) > 50 and len(faces) > 50
    assert np.abs(verts[:, 2] - 2.0).max() < vol.voxel_size
    assert faces.min() >= 0 and faces.max() < len(verts)
    n = vol.export_mesh_ply(str(tmp_path / "mesh.ply"))
    assert n == len(faces)
    head = (tmp_path / "mesh.ply").read_text().splitlines()[:12]
    assert head[0] == "ply" and any("element face" in l for l in head)


def test_multi_view_weighted_fusion():
    """Two views of the same wall agree; weights accumulate."""
    vol = _wall_volume()
    w1 = np.array(vol.weight).sum()
    # second camera shifted 0.2 m along x, same orientation: wall depth
    # is still exactly 2.0 everywhere (fronto-parallel plane)
    T2 = lie_np.make_pose(np.array([1.0, 0, 0, 0]),
                          np.array([0.2, 0.0, 0.0]))
    depth = np.full((H, W), 2.0, np.float32)
    vol.integrate(depth, K, T2)
    assert np.array(vol.weight).sum() > w1
    pts, _ = vol.extract_surface_points()
    assert np.abs(pts[:, 2] - 2.0).max() < 1.5 * vol.voxel_size
    assert vol.n_integrated == 2


def test_esdf_distances():
    vol = _wall_volume()
    d = vol.esdf(max_distance=1.0)
    t = np.array(vol.tsdf).reshape(vol.dims)
    w = np.array(vol.weight).reshape(vol.dims)
    occ = (t < 0) & (w > 0)
    assert d[occ].max() == 0.0
    # voxel 0.5 m in front of the wall along the axis: chamfer (L1 along
    # axes) equals true distance for axis-aligned geometry
    zs = vol.origin[2] + (np.arange(30) + 0.5) * vol.voxel_size
    iz = int(np.argmin(np.abs(zs - 1.45)))
    true = 2.05 - zs[iz]  # first occupied voxel center is at z≈2.05
    assert abs(d[15, 15, iz] - true) < 0.12
    # far free space saturates at max_distance
    assert d.max() <= 1.0 + 1e-6


def test_rays_outside_bounds_ignored():
    vol = TsdfVolume(origin=np.array([-1.5, -1.5, 0.0]),
                     dims=(16, 16, 16), voxel_size=0.1,
                     min_ray=0.5, max_ray=10.0, with_color=False)
    # depth below min_ray and non-finite: nothing integrates
    depth = np.full((H, W), 0.3, np.float32)
    depth[:10] = np.inf
    vol.integrate(depth, K, lie_np.pose_identity())
    assert np.array(vol.weight).sum() == 0.0
    assert vol.color is None
