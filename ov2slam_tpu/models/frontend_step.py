"""Fused per-frame front-end step: ONE device dispatch per frame.

The reference's per-frame hot path (`trackMono`, `visual_front_end.cpp:
65-128`) chains preprocess → KLT → epipolar filter → PnP as separate
CPU stages. A naive port dispatches each as its own jit call; on a
remote-attached TPU every dispatch pays the host↔device round trip, and
even locally each costs dispatch overhead. This module fuses the whole
per-frame device computation — CLAHE, pyramid build, landmark-projection
priors, forward-backward KLT, undistortion, essential-RANSAC outlier
gating, and two-pass motion-only PnP — into a single jitted function.

Transfer discipline (the throughput limiter on a tunneled remote device
is round-trip COUNT, not compute):
- every per-frame host input is packed into ONE (N+2, 8) f32 array —
  one upload RPC instead of ~10,
- the image uploads as uint8 (4x less tunnel bandwidth; cast to f32 on
  device),
- config scalars are STATIC jit arguments (constant per run — baked
  into the compiled program, zero per-frame scalar uploads),
- the PRNG key lives on device: the step consumes a key and returns its
  successor (`jax.random.split` inside the jit), so no per-frame host
  split dispatch,
- results return as ONE packed array; pyramids stay device-resident
  between frames (returned as outputs, fed back as inputs).

Host keeps only slot bookkeeping and the keyframe decision.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.camera import distort_fisheye, distort_radtan
from ..core.image import build_pyramid, clahe
from ..geometry.essential import essential_ransac
from ..ops.klt import fb_klt_track_split, klt_track
from ..solvers.pnp_refine import pnp_refine
from ..utils import lie


class CalibArrays(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray      # (4,)


def _undistort_px(px, calib: CalibArrays, fisheye: bool, iters: int = 8):
    xn = (px - jnp.stack([calib.cx, calib.cy])) / jnp.stack(
        [calib.fx, calib.fy])
    fn = distort_fisheye if fisheye else distort_radtan

    def body(_, xu):
        return xn - (fn(xu, calib.dist) - xu)

    xu = jax.lax.fori_loop(0, iters, body, xn)
    return xu * jnp.stack([calib.fx, calib.fy]) + jnp.stack(
        [calib.cx, calib.cy])


# state-row flag bits (column 7 of the packed per-frame state)
FLAG_VALID = 1
FLAG_IS3D = 2
FLAG_PAIR = 4


def pack_track_state(px, lm_pos, kf_px_und, valid, is3d, pair_valid,
                     T_pred, T_kf, out=None):
    """Host-side packing of all per-frame inputs into one (N+2, 8) f32
    buffer (single upload): rows 0..N-1 = [px(2)|lm_pos(3)|kf_px(2)|flags],
    row N = T_pred, row N+1 = T_kf. ``out`` reuses a preallocated buffer."""
    import numpy as np

    N = len(px)
    st = out if out is not None else np.zeros((N + 2, 8), np.float32)
    st[:N, 0:2] = px
    st[:N, 2:5] = lm_pos
    st[:N, 5:7] = kf_px_und
    st[:N, 7] = (valid * FLAG_VALID + is3d * FLAG_IS3D
                 + pair_valid * FLAG_PAIR)
    st[N, :7] = T_pred
    st[N + 1, :7] = T_kf
    return st


@partial(jax.jit, static_argnames=("detector", "cell_size", "max_out",
                                   "fisheye"))
def fused_detect_describe(img, px, valid, thresh, calib: CalibArrays,
                          detector: str = "fast", cell_size: int = 35,
                          max_out: int = 400, fisheye: bool = False):
    """Keyframe detection + BRIEF description + undistortion in ONE
    dispatch (the per-KF analogue of `fused_track_step`'s transfer
    discipline; separate eager calls cost 4+ device->host RPCs per KF).

    Returns (desc (N+max_out, 8) uint32 — rows 0..N-1 describe the
    CURRENT keypoints, rows N.. the fresh detections — and
    packed (max_out, 6) f32 [kp(2) | und(2) | score | ok]).
    """
    from ..ops.brief import describe_brief
    from ..ops.detect import detect_gftt, detect_grid_fast, \
        detect_single_scale

    img = img.astype(jnp.float32)
    if detector == "gftt":
        kps, scores, ok = detect_gftt(img, px, valid, thresh,
                                      cell_size=cell_size, max_out=max_out)
    elif detector == "single":
        kps, scores, ok = detect_single_scale(
            img, px, valid, thresh, cell_size=cell_size, max_out=max_out)
    else:
        kps, scores, ok = detect_grid_fast(
            img, px, valid, thresh, cell_size=cell_size, max_out=max_out)
    desc_cur, _ = describe_brief(img, px, valid)
    desc_new, ok2 = describe_brief(img, kps, ok)
    und_new = _undistort_px(kps, calib, fisheye)
    packed = jnp.concatenate([
        kps, und_new, scores[:, None],
        (ok & ok2)[:, None].astype(jnp.float32)], axis=1)
    return jnp.concatenate([desc_cur, desc_new], axis=0), packed


@partial(jax.jit, static_argnames=(
    "levels", "win", "iters", "use_clahe", "do_epipolar", "do_pose",
    "ransac_iters", "pnp_iters", "fisheye", "use_prior", "debug",
    "clahe_val", "max_fbklt_dist", "klt_err", "ransac_err_px",
    "robust_th", "split_sub", "track_from_kf"))
def fused_track_step(
    img,                     # (H, W) raw current frame (uint8 or f32)
    prev_pyr,                # tuple of prev-frame pyramid levels
    state,                   # (N+2, 8) f32 packed per-frame inputs
    key,                     # PRNG key for RANSAC (device-resident)
    calib: CalibArrays,
    clahe_val: float = 3.0,
    max_fbklt_dist: float = 0.5,
    klt_err: float = 30.0,
    ransac_err_px: float = 3.0,
    robust_th: float = 5.9915,
    levels: int = 4,
    win: int = 9,
    iters: int = 30,
    use_clahe: bool = False,
    do_epipolar: bool = True,
    do_pose: bool = True,
    ransac_iters: int = 100,
    pnp_iters: int = 10,
    fisheye: bool = False,
    use_prior: bool = True,
    debug: bool = False,
    split_sub: int = 0,
    kf_pyr=None,
    track_from_kf: bool = False,
):
    """Returns (cur_pyr, packed, key_next) where packed is an (N+3, 5) f32
    array — rows 0..N-1 hold [tracked_px(2) | und(2) | status], the 3 tail
    rows hold pose_ok, n_pose_inliers and T_new (see packing note below).

    - status: track survived fb-KLT (+ epipolar gate + PnP chi2 gate for
      3D slots when enabled).
    - T_new: refined pose (T_pred when do_pose is off or failed).
    - pose_ok: >= 5 PnP inliers.
    """
    N = state.shape[0] - 2
    px = state[:N, 0:2]
    lm_pos = state[:N, 2:5]
    kf_px_und = state[:N, 5:7]
    flags = state[:N, 7].astype(jnp.int32)
    valid = (flags & FLAG_VALID) > 0
    lm_is3d = (flags & FLAG_IS3D) > 0
    kf_pair_valid = (flags & FLAG_PAIR) > 0
    T_pred = state[N, :7]
    T_kf = state[N + 1, :7]
    return _track_body(
        img, prev_pyr, px, valid, lm_pos, kf_px_und, lm_is3d,
        kf_pair_valid, T_pred, T_kf, key, calib,
        clahe_val=clahe_val, max_fbklt_dist=max_fbklt_dist,
        klt_err=klt_err, ransac_err_px=ransac_err_px, robust_th=robust_th,
        levels=levels, win=win, iters=iters, use_clahe=use_clahe,
        do_epipolar=do_epipolar, do_pose=do_pose,
        ransac_iters=ransac_iters, pnp_iters=pnp_iters, fisheye=fisheye,
        use_prior=use_prior, debug=debug, split_sub=split_sub,
        kf_pyr=kf_pyr, track_from_kf=track_from_kf)


def _track_body(img, prev_pyr, px, valid, lm_pos, kf_px_und, lm_is3d,
                kf_pair_valid, T_pred, T_kf, key, calib: CalibArrays, *,
                clahe_val, max_fbklt_dist, klt_err, ransac_err_px,
                robust_th, levels, win, iters, use_clahe, do_epipolar,
                do_pose, ransac_iters, pnp_iters, fisheye, use_prior,
                debug, split_sub=0, kf_pyr=None, track_from_kf=False):
    """Shared per-frame device computation (traced inside both the
    host-packed and the device-chained entry points)."""
    img = img.astype(jnp.float32)
    key_next, key = jax.random.split(key)

    im = clahe(img, clahe_val) if use_clahe else img
    cur_pyr = tuple(build_pyramid(im, levels))

    # --- priors: project 3D landmarks under the predicted pose ---------- #
    T_cw = lie.pose_inverse(T_pred)
    pc = lie.pose_apply(T_cw[None], lm_pos)
    z = jnp.where(jnp.abs(pc[:, 2:3]) < 1e-3, 1e-3, pc[:, 2:3])
    proj = pc[:, :2] / z * jnp.stack([calib.fx, calib.fy]) + jnp.stack(
        [calib.cx, calib.cy])
    H, W = img.shape
    proj_ok = (lm_is3d & (pc[:, 2] > 0.1)
               & (proj[:, 0] >= 0) & (proj[:, 0] <= W - 1)
               & (proj[:, 1] >= 0) & (proj[:, 1] <= H - 1))
    # `klt_use_prior`: seed KLT at the projected position of the 3D
    # landmark under the predicted pose; off -> start at the previous
    # pixel (`kltTracking` prior branch, `visual_front_end.cpp:165-196`)
    priors = jnp.where(proj_ok[:, None], proj, px) if use_prior else px

    # --- forward-backward KLT ------------------------------------------ #
    # 3D/2D split (`visual_front_end.cpp:187-271`): 3D kps with an
    # in-image projected prior fb-track on the base level only; fb
    # failures and 2D kps get the full fb pyramid via a compacted
    # half-batch retry (see ops/klt.fb_klt_track_split — the fb gate is
    # internal there). Only meaningful once PnP runs and priors are on
    # (pre-init there are no 3D kps to split out).
    if track_from_kf and do_pose:
        # `kltTrackingFromKF` (`visual_front_end.cpp:278-442`): track
        # FROM the reference keyframe's image instead of the previous
        # frame — drift does not accumulate while the same kps stay
        # visible. Start positions are the slot's pixel in the KF
        # (recovered on device by re-distorting the stored undistorted
        # KF pixel); priors are the landmark projection (3D, tracked
        # over 2 levels) or the current tracked position (2D + prior
        # failures, full pyramid). Slots without a KF observation are
        # dropped, as the reference does (`:314-318,348-350`).
        fxy = jnp.stack([calib.fx, calib.fy])
        cxy = jnp.stack([calib.cx, calib.cy])
        dist_fn = distort_fisheye if fisheye else distort_radtan
        kf_raw = dist_fn((kf_px_und - cxy) / fxy, calib.dist) * fxy + cxy
        src = jnp.where(kf_pair_valid[:, None], kf_raw, px)
        valid_kf = valid & kf_pair_valid
        fwd, status = fb_klt_track_split(
            kf_pyr, cur_pyr, src, jnp.where(proj_ok[:, None], proj, px),
            valid_kf, proj_ok & use_prior,
            n_sub=(split_sub if split_sub > 0 else px.shape[0]),
            win=win, iters=iters, max_err=klt_err,
            max_fb_dist=max_fbklt_dist, n_base_levels=2, priors2=px)
        st_f = st_b = status
        fb = jnp.zeros(px.shape[0], px.dtype)
    elif split_sub > 0 and do_pose and use_prior:
        fwd, status = fb_klt_track_split(
            prev_pyr, cur_pyr, px, priors, valid, proj_ok,
            n_sub=split_sub, win=win, iters=iters, max_err=klt_err,
            max_fb_dist=max_fbklt_dist)
        st_f = st_b = status
        fb = jnp.zeros(px.shape[0], px.dtype)
    else:
        fwd, st_f, _ = klt_track(prev_pyr, cur_pyr, px, priors, valid,
                                 win=win, iters=iters, max_err=klt_err)
        bwd, st_b, _ = klt_track((cur_pyr[0],), (prev_pyr[0],), fwd, px,
                                 st_f, win=win, iters=iters,
                                 max_err=klt_err)
        fb = jnp.linalg.norm(bwd - px, axis=-1)
        status = st_f & st_b & (fb <= max_fbklt_dist)
    tracked = jnp.where(status[:, None], fwd, px)
    dbg = {}
    if debug:
        dbg = dict(st_fwd=st_f, st_bwd=st_b, fb=fb, priors=priors)

    und = _undistort_px(tracked, calib, fisheye)
    if debug:
        dbg["und"] = und

    # --- epipolar 2d-2d gate vs the reference keyframe ------------------ #
    if do_epipolar:
        pair = status & kf_pair_valid
        fxy = jnp.stack([calib.fx, calib.fy])
        cxy = jnp.stack([calib.cx, calib.cy])
        xl = (kf_px_und - cxy) / fxy
        xr = (und - cxy) / fxy
        key, k_e = jax.random.split(key)
        E, epi_inl, n_epi = essential_ransac(
            k_e, xl, xr, pair, focal=calib.fx, err_th_px=ransac_err_px,
            n_iters=ransac_iters)
        # ROTATION-COMPENSATED parallax (`computeParallax`,
        # `visual_front_end.cpp:1066-1141`): raw displacement is dominated
        # by rotation during turns, where the essential matrix is
        # translation-degenerate — the gate must measure translation-
        # induced flow only (`:530-535`)
        R_rel = lie.quat_to_matrix(
            lie.quat_mul(lie.quat_conj(T_pred[:4]), T_kf[:4]))
        xn_kf = jnp.concatenate([xl, jnp.ones_like(xl[:, :1])], -1)
        rot = xn_kf @ R_rel.T
        rot_px = rot[:, :2] / jnp.maximum(rot[:, 2:], 1e-6) * fxy + cxy
        parallax = jnp.sum(
            jnp.where(pair, jnp.linalg.norm(und - rot_px, axis=-1), 0.0)
        ) / jnp.maximum(pair.sum(), 1)
        # apply only when well-constrained: enough inliers & parallax
        # (`visual_front_end.cpp:530-535,559-569`) AND a majority
        # consensus — the reference skips removal when the model would
        # reject > 50% of the tracks ("might be degenerate case",
        # `visual_front_end.cpp:583-588`); without this, one bad RANSAC
        # draw at a turn onset guts the 3D working set before PnP
        n_pair = jnp.maximum(pair.sum(), 1)
        use_gate = ((n_epi >= 10) & (parallax >= 5.0)
                    & (n_epi >= 0.5 * n_pair))
        status = jnp.where(use_gate & pair, status & epi_inl, status)
        if debug:
            dbg.update(epi_inl=epi_inl, n_epi=n_epi, parallax=parallax,
                       use_gate=use_gate)

    # --- motion-only PnP ------------------------------------------------ #
    if do_pose:
        sel3d = status & lm_is3d
        T_ref, pnp_inl, _ = pnp_refine(
            T_pred, lm_pos, und, sel3d,
            calib.fx, calib.fy, calib.cx, calib.cy,
            robust_th=robust_th, iters=pnp_iters)
        n_inl = pnp_inl.sum()
        pose_ok = n_inl >= 5
        T_new = jnp.where(pose_ok, T_ref, T_pred)
        # drop 3D observations rejected by the chi2 gate — but only when
        # the solve succeeded; the outlier mask of a failed PnP is
        # meaningless and must not wipe the track set (the reference goes
        # to P3P with the keypoints intact, `visual_front_end.cpp:790-818`)
        status = status & jnp.where(sel3d & pose_ok, pnp_inl, True)
        if debug:
            dbg.update(pnp_inl=pnp_inl, sel3d=sel3d)
    else:
        T_new = T_pred
        pose_ok = jnp.asarray(False)
        n_inl = jnp.asarray(0, jnp.int32)

    # pack every host-bound result into ONE f32 array: on a tunneled
    # remote TPU each device->host transfer is a separate RPC with
    # millisecond-floor latency, so per-frame output must be one buffer.
    # Layout: rows 0..N-1 = [tracked(2) | und(2) | status], row N =
    # [pose_ok, n_inl, 0, 0, 0], row N+1 = T_new[0:5] padded, row N+2 =
    # T_new[5:7] padded.
    tail = jnp.zeros((3, 5), jnp.float32)
    tail = tail.at[0, 0].set(pose_ok.astype(jnp.float32))
    tail = tail.at[0, 1].set(n_inl.astype(jnp.float32))
    tail = tail.at[1, :5].set(T_new[:5])
    tail = tail.at[2, :2].set(T_new[5:7])
    packed = jnp.concatenate([
        jnp.concatenate([tracked, und,
                         status[:, None].astype(jnp.float32)], axis=1),
        tail], axis=0)
    if debug:
        return cur_pyr, packed, key_next, dbg
    return cur_pyr, packed, key_next


# --------------------------------------------------------------------- #
# device-chained tracking: zero blocking host round-trips per frame
# --------------------------------------------------------------------- #
#
# The host-packed entry point above needs the PREVIOUS frame's result on
# the host before it can build the next frame's input — which forces one
# blocking device→host read per frame (a ~30 ms floor on a tunneled
# remote chip; the measured e2e throughput limiter). The chained variant
# keeps the whole recurrent state ON DEVICE:
#
#   S (N+2, 8) f32:  rows 0..N-1 [px(2) | und(2) | status | 0 0 0]
#                    row N   = T_cur  (this frame's pose)
#                    row N+1 = T_prev (previous frame's pose)
#   lm_static (N+1, 8) f32: rows 0..N-1 [lm_pos(3) | kf_px_und(2) | flags]
#                    row N = T_kf
#
# and computes the constant-velocity prior on device
# (`MotionModel::applyMotionModel`, `visual_front_end.hpp:43-58`, with
# dt/rel_dt = 1 — dataset frame intervals are uniform to ~ms):
#
#   T_pred = T_cur ∘ (T_prev⁻¹ ∘ T_cur)
#
# The host receives the same packed view as the sync path, but reads it
# ONE FRAME LATE, overlapped with the next frame's dispatch
# (`copy_to_host_async`). `lm_static` is refreshed by a cheap async
# upload whenever the map changes (BA write-back, 2D→3D promotion,
# culling) — chain staleness is bounded by one frame.

def pack_lm_static(lm_pos, kf_px_und, valid, is3d, pair_valid, T_kf,
                   out=None):
    """Host-side packing of the slow-changing per-slot map view."""
    import numpy as np

    N = len(lm_pos)
    st = out if out is not None else np.zeros((N + 1, 8), np.float32)
    st[:N, 0:3] = lm_pos
    st[:N, 3:5] = kf_px_und
    st[:N, 5] = (valid * FLAG_VALID + is3d * FLAG_IS3D
                 + pair_valid * FLAG_PAIR)
    st[N, :7] = T_kf
    return st


def pack_chain_state(px, px_und, status, T_cur, T_prev, out=None):
    """Host-side packing of the recurrent chain state (used to seed or
    re-seed the chain after keyframes / fallbacks)."""
    import numpy as np

    N = len(px)
    st = out if out is not None else np.zeros((N + 2, 8), np.float32)
    st[:N, 0:2] = px
    st[:N, 2:4] = px_und
    st[:N, 4] = status
    st[N, :7] = T_cur
    st[N + 1, :7] = T_prev
    return st


@partial(jax.jit, static_argnames=(
    "levels", "win", "iters", "use_clahe", "do_epipolar", "do_pose",
    "ransac_iters", "pnp_iters", "fisheye", "use_prior",
    "clahe_val", "max_fbklt_dist", "klt_err", "ransac_err_px",
    "robust_th", "split_sub"))
def fused_track_step_chained(
    img, prev_pyr, S_prev, lm_static, dt_ratio, key,
    calib: CalibArrays,
    clahe_val: float = 3.0,
    max_fbklt_dist: float = 0.5,
    klt_err: float = 30.0,
    ransac_err_px: float = 3.0,
    robust_th: float = 5.9915,
    levels: int = 4,
    win: int = 9,
    iters: int = 30,
    use_clahe: bool = False,
    do_epipolar: bool = True,
    do_pose: bool = True,
    ransac_iters: int = 100,
    pnp_iters: int = 10,
    fisheye: bool = False,
    use_prior: bool = True,
    split_sub: int = 0,
):
    """Returns (cur_pyr, S_out, packed, key_next).

    ``packed`` has the exact layout of :func:`fused_track_step`'s output
    (the host applies it one frame late); ``S_out`` feeds the next call.
    """
    N = S_prev.shape[0] - 2
    px = S_prev[:N, 0:2]
    status_prev = S_prev[:N, 4] > 0.5
    T_cur = S_prev[N, :7]
    T_prev = S_prev[N + 1, :7]

    lm_pos = lm_static[:N, 0:3]
    kf_px_und = lm_static[:N, 3:5]
    flags = lm_static[:N, 5].astype(jnp.int32)
    valid = status_prev & ((flags & FLAG_VALID) > 0)
    lm_is3d = (flags & FLAG_IS3D) > 0
    kf_pair_valid = (flags & FLAG_PAIR) > 0
    T_kf = lm_static[N, :7]

    # on-device constant-velocity prior, scaled by dt_ratio (frame-drop
    # gaps: the prior must extrapolate the ACTUAL time gap, or KLT priors
    # lag the motion by the dropped frames and tracking collapses);
    # zero T_prev row = no history yet
    has_prev = jnp.abs(T_prev).sum() > 0
    rel = lie.pose_compose(lie.pose_inverse(T_prev), T_cur)
    r = dt_ratio[0]
    w_scaled = lie.so3_exp(lie.so3_log(rel[:4]) * r)
    rel_s = jnp.concatenate([w_scaled, rel[4:] * r])
    T_pred = jnp.where(has_prev, lie.pose_compose(T_cur, rel_s), T_cur)

    cur_pyr, packed, key_next = _track_body(
        img, prev_pyr, px, valid, lm_pos, kf_px_und, lm_is3d,
        kf_pair_valid, T_pred, T_kf, key, calib,
        clahe_val=clahe_val, max_fbklt_dist=max_fbklt_dist,
        klt_err=klt_err, ransac_err_px=ransac_err_px, robust_th=robust_th,
        levels=levels, win=win, iters=iters, use_clahe=use_clahe,
        do_epipolar=do_epipolar, do_pose=do_pose,
        ransac_iters=ransac_iters, pnp_iters=pnp_iters, fisheye=fisheye,
        use_prior=use_prior, debug=False, split_sub=split_sub)

    T_new = jnp.concatenate([packed[N + 1, :5], packed[N + 2, :2]])
    S_out = jnp.zeros_like(S_prev)
    S_out = S_out.at[:N, 0:5].set(packed[:N, 0:5])
    S_out = S_out.at[N, :7].set(T_new)
    S_out = S_out.at[N + 1, :7].set(T_cur)
    # row N col 2 is a marker that this packed view came from the chained
    # step (the host reconstructs the motion-model prior itself; the
    # device prior is NOT shipped back — only T_new is)
    packed = packed.at[N, 2].set(1.0)
    return cur_pyr, S_out, packed, key_next


@jax.jit
def patch_chain_rows(S, rows, px, und, status):
    """Scatter freshly detected keyframe slots into the device chain
    state. FIXED SHAPES: rows is always (max_kps,) padded with a LARGE
    POSITIVE out-of-bounds index (dropped by the scatter — negative
    padding would WRAP onto the pose rows) — a per-detection-count
    shape would recompile on every keyframe (~seconds each on a remote
    compiler).
    px/und: (max_kps, 2); status: (max_kps,)."""
    upd = jnp.concatenate([px, und, status[:, None]], axis=1)
    return S.at[rows, 0:5].set(upd, mode="drop")


@partial(jax.jit, static_argnames=("win", "iters", "fisheye"))
def advance_chain_patch(pyr_a, pyr_b, px, status, calib: CalibArrays,
                        win: int = 9, iters: int = 30,
                        fisheye: bool = False):
    """Advance freshly detected keyframe slots by ONE frame hop
    (pyr_a → pyr_b) so their positions are expressed at the device
    chain's HEAD frame before `patch_chain_rows` scatters them in.

    Without this, detections made on the resolved frame j would be
    patched into a chain whose last tracked frame is j+depth-1 — the
    next KLT would then sample their template at a stale location and
    most fresh slots would die under fast motion (the round-4
    keyframe-cascade failure). One hop per in-flight frame, all on
    device, no readback. Slots that cannot be tracked across the hop
    are dropped (status → 0)."""
    fwd, st, _ = klt_track(pyr_a, pyr_b, px, px, status > 0.5,
                           win=win, iters=iters)
    und = _undistort_px(fwd, calib, fisheye)
    return fwd, und, st.astype(jnp.float32) * status


@jax.jit
def patch_chain_pose_delta(S, delta):
    """Left-compose a world-frame correction onto the chain's pose rows
    (BA moved the map while frames were in flight: T' = delta ∘ T)."""
    N = S.shape[0] - 2
    S = S.at[N, :7].set(lie.pose_compose(delta, S[N, :7]))
    return S.at[N + 1, :7].set(lie.pose_compose(delta, S[N + 1, :7]))
