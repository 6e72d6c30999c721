"""Fused keyframe-mapping device steps: static shapes, one dispatch each.

The reference's Mapper chains stereo matching -> stereo triangulation ->
temporal triangulation as separate CPU stages over std::vectors
(`mapper.cpp:44-188`). A direct port dispatches each sub-step per
*dynamically sized* keypoint subset — on XLA every distinct shape is a
fresh compilation, and on a remote-attached TPU every dispatch pays a
host<->device round trip. These kernels instead run the whole stereo pass
(CLAHE + pyramid + SAD/projection priors + fb-KLT + Sampson gate +
midpoint triangulation + reprojection checks) and the whole temporal
triangulation (per-row anchor poses, vmapped midpoint) as ONE jitted
call each over the fixed keypoint capacity, with masks for validity.
Results come back as a single packed f32 array: one transfer per stage.

Reference parity: `MapManager::stereoMatching` (`map_manager.cpp:367-611`),
`Mapper::triangulateStereo` (`mapper.cpp:346-461`),
`Mapper::triangulateTemporal` (`mapper.cpp:191-344`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.image import build_pyramid, clahe
from ..geometry.essential import sampson_dist_sq
from ..geometry.triangulation import reprojection_checks, triangulate_midpoint
from ..ops.klt import fb_klt_track
from ..ops.stereo_sad import line_min_sad
from ..utils import lie
from .frontend_step import CalibArrays, _undistort_px


def _bearing_from_und(px_und, calib: CalibArrays):
    """Unit bearing from an UNDISTORTED pixel (normalize through K)."""
    xn = (px_und - jnp.stack([calib.cx, calib.cy])) / jnp.stack(
        [calib.fx, calib.fy])
    bv = jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], -1)
    return bv / jnp.linalg.norm(bv, axis=-1, keepdims=True)


def pack_stereo_state(px, lm_pos, valid, is3d, T_wc, out=None):
    """(N+1, 8) f32 single-upload state: rows 0..N-1 =
    [px(2)|lm_pos(3)|flags|0|0], row N = T_wc."""
    import numpy as np

    N = len(px)
    st = out if out is not None else np.zeros((N + 1, 8), np.float32)
    st[:N, 0:2] = px
    st[:N, 2:5] = lm_pos
    st[:N, 5] = valid * 1.0 + is3d * 2.0
    st[N, :7] = T_wc
    return st


@partial(jax.jit, static_argnames=(
    "levels", "win", "iters", "use_clahe", "rectified", "fisheye_r",
    "clahe_val", "klt_err", "max_fbklt_dist", "max_reproj_err"))
def fused_stereo_map_step(
    left_pyr,                # tuple of left pyramid levels
    right_img,               # (H, W) raw right frame (uint8 or f32)
    state,                   # (N+1, 8) f32 packed (pack_stereo_state)
    T_lr,                    # (7,) right-in-left extrinsic
    E_lr,                    # (3, 3) stereo essential matrix
    calib_l: CalibArrays,
    calib_r: CalibArrays,
    clahe_val: float = 3.0,
    klt_err: float = 30.0,
    max_fbklt_dist: float = 0.5,
    max_reproj_err: float = 3.0,     # px
    levels: int = 4,
    win: int = 9,
    iters: int = 30,
    use_clahe: bool = False,
    rectified: bool = True,
    fisheye_r: bool = False,
):
    """Returns packed (N, 8) f32:
    [rpx(2) | pts_w(3) | stereo_ok | tri_ok | tri_cand].

    stereo_ok: fb-KLT survived + Sampson-gated stereo match
    (`map_manager.cpp:498-603`). tri_ok: newly triangulated (among
    not-yet-3D stereo matches) passing depth/reprojection checks
    (`mapper.cpp:410-448`); pts_w only meaningful there.
    """
    right_img = right_img.astype(jnp.float32)
    N = state.shape[0] - 1
    px = state[:N, 0:2]
    lm_pos = state[:N, 2:5]
    flags = state[:N, 5].astype(jnp.int32)
    valid = (flags & 1) > 0
    lm_is3d = (flags & 2) > 0
    T_wc = state[N, :7]
    im = clahe(right_img, clahe_val) if use_clahe else right_img
    right_pyr = tuple(build_pyramid(im, levels))
    H, W = right_img.shape

    # priors (`map_manager.cpp:396-489`): rectified SAD scan for all kps,
    # overridden by the 3D-landmark projection into the right camera
    priors = px
    if rectified:
        sad_priors, _, _ = line_min_sad(left_pyr[0], right_pyr[0], px,
                                        valid)
        priors = jnp.where(valid[:, None], sad_priors, px)
    T_wr = lie.pose_compose(T_wc, T_lr)
    pr = lie.pose_apply(lie.pose_inverse(T_wr)[None], lm_pos)
    z = jnp.where(jnp.abs(pr[:, 2:3]) < 1e-3, 1e-3, pr[:, 2:3])
    proj = pr[:, :2] / z * jnp.stack([calib_r.fx, calib_r.fy]) + jnp.stack(
        [calib_r.cx, calib_r.cy])
    ok3 = (lm_is3d & (pr[:, 2] > 0.1)
           & (proj[:, 0] >= 0) & (proj[:, 0] <= W - 1)
           & (proj[:, 1] >= 0) & (proj[:, 1] <= H - 1))
    priors = jnp.where(ok3[:, None], proj, priors)

    tracked, status = fb_klt_track(
        left_pyr, right_pyr, px, priors, valid,
        win=win, iters=iters, max_err=klt_err,
        max_fb_dist=max_fbklt_dist)

    # Sampson residual gate under the known stereo geometry
    # (`map_manager.cpp:583-603`)
    xl = (px - jnp.stack([calib_l.cx, calib_l.cy])) / jnp.stack(
        [calib_l.fx, calib_l.fy])
    r_und = _undistort_px(tracked, calib_r, fisheye_r)
    xr = (r_und - jnp.stack([calib_r.cx, calib_r.cy])) / jnp.stack(
        [calib_r.fx, calib_r.fy])
    d2 = sampson_dist_sq(E_lr, xl, xr)
    epi_ok = d2 < (max_reproj_err / calib_l.fx) ** 2
    stereo_ok = status & epi_ok & valid

    # stereo triangulation of not-yet-3D matches (`mapper.cpp:346-461`)
    cand = stereo_ok & ~lm_is3d
    bl = _bearing_from_und(px, calib_l)
    br = _bearing_from_und(r_und, calib_r)
    pts_l = triangulate_midpoint(T_lr[None], bl, br)
    ok = reprojection_checks(T_lr, bl, br, pts_l, calib_l.fx,
                             max_reproj_err, min_depth=0.05)
    tri_ok = cand & ok
    pts_w = lie.pose_apply(T_wc[None], pts_l)

    return jnp.concatenate([
        tracked, pts_w,
        stereo_ok[:, None].astype(jnp.float32),
        tri_ok[:, None].astype(jnp.float32),
        cand[:, None].astype(jnp.float32)], axis=1)


def pack_temporal_state(px_a, px_c, T_a, T_rel, valid, out=None):
    """(N, 19) f32 single-upload state:
    [px_a(2)|px_c(2)|T_a(7)|T_rel(7)|valid]."""
    import numpy as np

    N = len(px_a)
    st = out if out is not None else np.zeros((N, 19), np.float32)
    st[:, 0:2] = px_a
    st[:, 2:4] = px_c
    st[:, 4:11] = T_a
    st[:, 11:18] = T_rel
    st[:, 18] = valid
    return st


@partial(jax.jit, static_argnames=("max_reproj_err",))
def fused_temporal_step(
    state,                   # (N, 19) f32 packed (pack_temporal_state)
    calib_l: CalibArrays,
    max_reproj_err: float = 3.0,
):
    """Temporal triangulation vs each landmark's anchor keyframe — ALL
    candidates in one vmapped batch with per-row poses (the reference
    loops per keypoint, `mapper.cpp:191-344`).

    Returns packed (N, 4) f32: [pts_w(3) | ok].
    """
    px_a = state[:, 0:2]
    px_c = state[:, 2:4]
    T_a = state[:, 4:11]
    T_rel = state[:, 11:18]
    valid = state[:, 18] > 0.5
    ba = _bearing_from_und(px_a, calib_l)
    bc = _bearing_from_und(px_c, calib_l)
    pts_a = triangulate_midpoint(T_rel, ba, bc)
    ok = reprojection_checks(T_rel, ba, bc, pts_a, calib_l.fx,
                             max_reproj_err, min_depth=0.05) & valid
    pts_w = lie.pose_apply(T_a, pts_a)
    return jnp.concatenate([pts_w, ok[:, None].astype(jnp.float32)],
                           axis=1)
