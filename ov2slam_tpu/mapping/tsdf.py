"""TSDF volumetric mapping — TPU-native replacement for the fork's voxblox
glue (`launch/carla.launch:28-76` runs a voxblox `tsdf_server` over the
fused RGB-D cloud from `scripts/talker.py`; params: voxel 0.1 m,
truncation 0.3 m, ray bounds 0.5-10 m, 1/z^2 weights, color mode, PLY
mesh output, ESDF distances).

Design (TPU-first, not a voxblox port): voxblox raycasts each point of an
unordered cloud through sparse voxel blocks — a scatter-heavy, pointer-
chasing pattern. Here integration is inverted into a *projective* update:
every voxel of a fixed-capacity dense grid is projected into the depth
image in ONE fused elementwise+gather pass (classic KinectFusion-style
TSDF), which XLA fuses into a single bandwidth-bound kernel with static
shapes. Multi-camera rigs integrate one depth image per camera —
equivalent coverage to voxblox's "merged" raycasting for projective
sensors. Meshing uses naive surface nets (vectorized, host-side); the
ESDF is a chamfer sweep of 6-neighbor min-plus updates under `lax.scan`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import lie_np


@partial(jax.jit, static_argnames=("dims", "use_const_weight"))
def _tsdf_integrate(tsdf, weight, color, depth, rgb, T_cw, fx, fy, cx, cy,
                    origin, voxel, trunc, min_ray, max_ray, max_weight,
                    dims: Tuple[int, int, int],
                    use_const_weight: bool):
    """One projective TSDF update over the whole grid.

    tsdf:   (V,) signed distance in truncation units, in [-1, 1]
    weight: (V,) accumulated observation weight
    color:  (V, 3) running-average color (f32) or None
    depth:  (H, W) metric depth; rgb: (H, W, 3) or None
    T_cw:   (7,) world->camera pose [q, t]
    """
    nx, ny, nz = dims
    H, W = depth.shape
    idx = jnp.arange(nx * ny * nz)
    ix = idx // (ny * nz)
    iy = (idx // nz) % ny
    iz = idx % nz
    pw = origin[None, :] + (jnp.stack([ix, iy, iz], -1).astype(jnp.float32)
                            + 0.5) * voxel

    from ..utils import lie
    pc = lie.pose_apply(T_cw, pw)
    z = pc[:, 2]
    zs = jnp.where(z > 1e-6, z, 1.0)
    u = fx * pc[:, 0] / zs + cx
    v = fy * pc[:, 1] / zs + cy
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    d = depth[vi, ui]

    in_img = (z > 1e-6) & (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    d_ok = jnp.isfinite(d) & (d >= min_ray) & (d <= max_ray)
    sdf = d - z
    # update only voxels in front of / within one truncation band behind
    # the measured surface (voxblox: no carving beyond -trunc)
    upd = in_img & d_ok & (sdf > -trunc)
    tsdf_obs = jnp.clip(sdf / trunc, -1.0, 1.0)

    if use_const_weight:
        w_obs = jnp.ones_like(d)
    else:  # voxblox use_const_weight=false => 1/z^2 dropoff
        w_obs = 1.0 / jnp.maximum(d, 1e-3) ** 2
    w_obs = jnp.where(upd, w_obs, 0.0)

    w_new = weight + w_obs
    denom = jnp.maximum(w_new, 1e-9)
    tsdf_new = (tsdf * weight + tsdf_obs * w_obs) / denom
    out_color = color
    if color is not None and rgb is not None:
        c_obs = rgb[vi, ui].astype(jnp.float32)
        out_color = (color * weight[:, None]
                     + c_obs * w_obs[:, None]) / denom[:, None]
    w_new = jnp.minimum(w_new, max_weight)
    return tsdf_new, w_new, out_color


@partial(jax.jit, static_argnames=("n_iters",))
def _esdf_sweep(occ_dist, voxel, n_iters: int):
    """Chamfer distance transform: n_iters of 6-neighbor min-plus updates
    (each iteration propagates distance one voxel outward)."""
    big = jnp.float32(1e9)

    def body(d, _):
        p = jnp.pad(d, 1, constant_values=big)
        d = jnp.minimum(d, p[:-2, 1:-1, 1:-1] + voxel)
        d = jnp.minimum(d, p[2:, 1:-1, 1:-1] + voxel)
        d = jnp.minimum(d, p[1:-1, :-2, 1:-1] + voxel)
        d = jnp.minimum(d, p[1:-1, 2:, 1:-1] + voxel)
        d = jnp.minimum(d, p[1:-1, 1:-1, :-2] + voxel)
        d = jnp.minimum(d, p[1:-1, 1:-1, 2:] + voxel)
        return d, None

    out, _ = jax.lax.scan(body, occ_dist, None, length=n_iters)
    return out


@dataclass
class TsdfVolume:
    """Fixed-capacity dense TSDF grid (static shapes => one compiled
    integrate kernel reused for every frame and camera)."""

    origin: np.ndarray                       # (3,) world min corner
    dims: Tuple[int, int, int]               # voxels per axis
    voxel_size: float = 0.1                  # carla.launch voxel_size
    truncation: float = 0.3                  # truncation_distance
    min_ray: float = 0.5                     # min_ray_length_m
    max_ray: float = 10.0                    # max_ray_length_m
    use_const_weight: bool = False           # use_const_weight
    max_weight: float = 1e4
    with_color: bool = True

    tsdf: jnp.ndarray = field(init=False)
    weight: jnp.ndarray = field(init=False)
    color: Optional[jnp.ndarray] = field(init=False)
    n_integrated: int = field(init=False, default=0)

    def __post_init__(self):
        v = int(np.prod(self.dims))
        self.origin = np.asarray(self.origin, np.float32)
        self.tsdf = jnp.ones(v, jnp.float32)
        self.weight = jnp.zeros(v, jnp.float32)
        self.color = jnp.zeros((v, 3), jnp.float32) if self.with_color \
            else None

    def integrate(self, depth: np.ndarray, K: np.ndarray,
                  T_wc: np.ndarray, rgb: Optional[np.ndarray] = None):
        """Fuse one depth (+optional RGB) frame taken at camera pose T_wc
        (world-from-camera, [q, t] 7-vector)."""
        T_cw = lie_np.pose_inverse(np.asarray(T_wc, np.float64))
        rgb_j = None
        if self.color is not None:
            rgb_j = (jnp.asarray(rgb, jnp.float32) if rgb is not None
                     else jnp.zeros((*depth.shape, 3), jnp.float32))
        self.tsdf, self.weight, self.color = _tsdf_integrate(
            self.tsdf, self.weight, self.color,
            jnp.asarray(depth, jnp.float32), rgb_j,
            jnp.asarray(T_cw, jnp.float32),
            jnp.float32(K[0, 0]), jnp.float32(K[1, 1]),
            jnp.float32(K[0, 2]), jnp.float32(K[1, 2]),
            jnp.asarray(self.origin), jnp.float32(self.voxel_size),
            jnp.float32(self.truncation), jnp.float32(self.min_ray),
            jnp.float32(self.max_ray), jnp.float32(self.max_weight),
            dims=self.dims, use_const_weight=self.use_const_weight)
        self.n_integrated += 1

    def integrate_frames(self, frames: Sequence[Tuple]):
        """Fuse (depth, rgb|None, K, T_wc) tuples — same frame format as
        `io.rgbd.fuse_rgbd_frames` (the talker.py multi-camera rig)."""
        for depth, rgb, K, T_wc in frames:
            self.integrate(depth, K, T_wc, rgb=rgb)

    # ---- queries ---------------------------------------------------

    def _grids(self, min_weight: float):
        t = np.array(self.tsdf).reshape(self.dims)
        w = np.array(self.weight).reshape(self.dims)
        return t, w >= min_weight

    def voxel_centers(self) -> np.ndarray:
        nx, ny, nz = self.dims
        g = np.stack(np.meshgrid(np.arange(nx), np.arange(ny),
                                 np.arange(nz), indexing="ij"),
                     -1).reshape(-1, 3)
        return self.origin + (g + 0.5) * self.voxel_size

    def extract_surface_points(self, min_weight: float = 1e-4):
        """Near-surface voxel centers (|tsdf| < 1 voxel) with colors —
        voxblox `publish_pointclouds` equivalent."""
        t = np.array(self.tsdf)
        w = np.array(self.weight)
        band = self.voxel_size / self.truncation
        sel = (w >= min_weight) & (np.abs(t) < band)
        pts = self.voxel_centers()[sel]
        cols = None
        if self.color is not None:
            cols = np.clip(np.array(self.color)[sel], 0, 255) \
                .astype(np.uint8)
        return pts, cols

    def extract_mesh(self, min_weight: float = 1e-4):
        """Naive surface nets over the zero level set.

        Returns (vertices (Nv,3), faces (Nf,3) int, colors (Nv,3) u8|None).
        One vertex per dual cell (2x2x2 voxel cube) containing a sign
        change, placed at the mean of its edge zero-crossings; two
        triangles per sign-changing voxel edge, wound toward the
        positive (outside) voxel.
        """
        t, obs = self._grids(min_weight)
        nx, ny, nz = self.dims
        # cell (i,j,k) spans voxels [i..i+1]x[j..j+1]x[k..k+1]
        cdims = (nx - 1, ny - 1, nz - 1)
        corners = np.empty((8,) + cdims, np.float32)
        cobs = np.ones(cdims, bool)
        for b in range(8):
            dx, dy, dz = b & 1, (b >> 1) & 1, (b >> 2) & 1
            corners[b] = t[dx:dx + cdims[0], dy:dy + cdims[1],
                           dz:dz + cdims[2]]
            cobs &= obs[dx:dx + cdims[0], dy:dy + cdims[1],
                        dz:dz + cdims[2]]
        neg = corners < 0
        has_vert = cobs & neg.any(0) & (~neg).any(0)
        cell_ids = -np.ones(cdims, np.int64)
        ci, cj, ck = np.nonzero(has_vert)
        cell_ids[ci, cj, ck] = np.arange(len(ci))
        if len(ci) == 0:
            return (np.zeros((0, 3), np.float32),
                    np.zeros((0, 3), np.int64), None)

        # vertex = mean of edge zero-crossings within the cube
        offs = np.array([[b & 1, (b >> 1) & 1, (b >> 2) & 1]
                         for b in range(8)], np.float32)
        edges = [(a, b) for a in range(8) for b in range(a + 1, 8)
                 if bin(a ^ b).count("1") == 1]
        vsum = np.zeros((len(ci), 3), np.float64)
        vcnt = np.zeros(len(ci), np.float64)
        vals = corners[:, ci, cj, ck]           # (8, Nc)
        for a, b in edges:
            va, vb = vals[a], vals[b]
            cross = (va < 0) != (vb < 0)
            alpha = np.where(cross, va / np.where(
                (va - vb) == 0, 1.0, va - vb), 0.0)
            p = offs[a][None] + alpha[:, None] * (offs[b] - offs[a])[None]
            vsum += np.where(cross[:, None], p, 0.0)
            vcnt += cross
        local = vsum / np.maximum(vcnt, 1)[:, None]
        base = np.stack([ci, cj, ck], -1).astype(np.float64)
        verts = (self.origin + (base + local + 0.5) * self.voxel_size) \
            .astype(np.float32)

        # faces: for each voxel edge with a sign change, connect the 4
        # dual cells around it (two triangles), oriented by sign
        faces = []
        for axis in range(3):
            sl_lo = [slice(0, -1) if a == axis else slice(None)
                     for a in range(3)]
            sl_hi = [slice(1, None) if a == axis else slice(None)
                     for a in range(3)]
            v0, v1 = t[tuple(sl_lo)], t[tuple(sl_hi)]
            o0, o1 = obs[tuple(sl_lo)], obs[tuple(sl_hi)]
            cross = ((v0 < 0) != (v1 < 0)) & o0 & o1
            ei, ej, ek = np.nonzero(cross)
            # the 4 dual cells share this edge; offsets in the two
            # non-edge axes
            a1, a2 = [a for a in range(3) if a != axis]
            e = np.stack([ei, ej, ek], -1)
            quad_ids = []
            ok = np.ones(len(ei), bool)
            for (d1, d2) in ((0, 0), (1, 0), (1, 1), (0, 1)):
                c = e.copy()
                c[:, a1] -= d1
                c[:, a2] -= d2
                inb = ((c >= 0).all(1)
                       & (c < np.array(cdims)[None]).all(1))
                ids = np.where(
                    inb, cell_ids[c[:, 0].clip(0, cdims[0] - 1),
                                  c[:, 1].clip(0, cdims[1] - 1),
                                  c[:, 2].clip(0, cdims[2] - 1)], -1)
                ok &= ids >= 0
                quad_ids.append(ids)
            q = np.stack(quad_ids, -1)[ok]          # (Ne, 4)
            flip = (v0 < 0)[ei, ej, ek][ok]         # edge points -inside
            tri1 = np.where(flip[:, None], q[:, [0, 1, 2]],
                            q[:, [0, 2, 1]])
            tri2 = np.where(flip[:, None], q[:, [0, 2, 3]],
                            q[:, [0, 3, 2]])
            faces.append(tri1)
            faces.append(tri2)
        faces = np.concatenate(faces) if faces else np.zeros((0, 3),
                                                             np.int64)
        cols = None
        if self.color is not None:
            cg = np.array(self.color).reshape(self.dims + (3,))
            cols = np.clip(cg[ci, cj, ck], 0, 255).astype(np.uint8)
        return verts, faces, cols

    def esdf(self, max_distance: float = 5.0,
             min_weight: float = 1e-4) -> np.ndarray:
        """Euclidean-ish (chamfer) distance field from the occupied set
        (tsdf < 0) — voxblox esdf_server equivalent with
        esdf_max_distance_m/esdf_default_distance_m = max_distance."""
        t, obs = self._grids(min_weight)
        occ = (t < 0) & obs
        d0 = jnp.where(jnp.asarray(occ), 0.0, 1e9).astype(jnp.float32)
        n_iters = int(np.ceil(max_distance / self.voxel_size))
        d = np.array(_esdf_sweep(d0, jnp.float32(self.voxel_size),
                                 n_iters))
        return np.minimum(d, max_distance).astype(np.float32)

    def export_mesh_ply(self, path: str, min_weight: float = 1e-4) -> int:
        """Write the surface-nets mesh as PLY (voxblox mesh_filename
        output). Returns the face count."""
        verts, faces, cols = self.extract_mesh(min_weight)
        with open(path, "w") as f:
            f.write("ply\nformat ascii 1.0\n")
            f.write(f"element vertex {len(verts)}\n")
            f.write("property float x\nproperty float y\n"
                    "property float z\n")
            if cols is not None:
                f.write("property uchar red\nproperty uchar green\n"
                        "property uchar blue\n")
            f.write(f"element face {len(faces)}\n")
            f.write("property list uchar int vertex_indices\n")
            f.write("end_header\n")
            for i, p in enumerate(verts):
                row = f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f}"
                if cols is not None:
                    c = cols[i]
                    row += f" {int(c[0])} {int(c[1])} {int(c[2])}"
                f.write(row + "\n")
            for tri in faces:
                f.write(f"3 {int(tri[0])} {int(tri[1])} {int(tri[2])}\n")
        return len(faces)
