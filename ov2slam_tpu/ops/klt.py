"""Pyramidal forward-backward KLT tracking, batched over keypoints.

TPU-native replacement for `FeatureTracker::fbKltTracking`
(`src/feature_tracker.cpp:35-137`), which wraps cv::calcOpticalFlowPyrLK.
Semantics mirrored from the reference:

- forward pass over the full pyramid with initial-flow priors
  (`OPTFLOW_USE_INITIAL_FLOW`, `feature_tracker.cpp:66-69`),
- min-eigenvalue gating of the spatial gradient matrix (the
  `OPTFLOW_LK_GET_MIN_EIGENVALS` + err filter, `:87-89`),
- backward pass on the base level only (`nbpyrlvl = 0`, `:113-116`),
- forward-backward distance check (`:125-128`).

Performance design (v5e measured): XLA's point-gather costs ~32 ns/elem,
so per-iteration patch gathers are replaced by

1. one MXU-matmul patch extraction per level per image
   (`ops/patch.extract_patches`): template + search window, and
2. gather-free in-patch resampling per Gauss-Newton iteration
   (`ops/patch.sample_window`): a hat-weighted blend over static shifts —
   pure VPU work inside a ``fori_loop``.

The search window has ``margin`` px of slack on each side; flow corrections
within one level beyond the margin are clamped (the forward-backward check
kills the rare track that actually needed more — same failure surface as
OpenCV's window-escape losses).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .patch import extract_patches, sample_window


def track_level(
    img_prev, img_cur, kps_lvl, flow, alive,
    win: int, iters: int, eps: float, min_eig_th: float, margin: int,
):
    """One pyramid level of Lucas-Kanade for all keypoints.

    Args:
      img_prev/img_cur: (H, W) level images.
      kps_lvl: (N, 2) keypoint positions at this level (xy, px).
      flow: (N, 2) current flow estimates at this level.
      alive: (N,) bool — tracks still valid.

    Returns: (flow, alive, min_eig, residual)
    """
    H, W = img_prev.shape
    r = win // 2
    n_px = win * win

    # Template patch (win+2 for central-difference gradients), bilinear at
    # the subpixel keypoint position.
    tpatch = extract_patches(img_prev, kps_lvl - (r + 1), win + 2)
    T = tpatch[:, 1:-1, 1:-1]
    Ix = 0.5 * (tpatch[:, 1:-1, 2:] - tpatch[:, 1:-1, :-2])
    Iy = 0.5 * (tpatch[:, 2:, 1:-1] - tpatch[:, :-2, 1:-1])

    gxx = jnp.sum(Ix * Ix, axis=(-2, -1))
    gxy = jnp.sum(Ix * Iy, axis=(-2, -1))
    gyy = jnp.sum(Iy * Iy, axis=(-2, -1))
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    min_eig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / (
        2.0 * n_px)
    good_g = min_eig > min_eig_th
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    iA = gyy / det_safe
    iB = -gxy / det_safe
    iD = gxx / det_safe

    # Search patch around the prior flow estimate (integer-aligned corner so
    # extraction is an exact copy); S = win + 2*margin.
    S = win + 2 * margin
    base = jnp.floor(kps_lvl + flow) - r - margin        # (N, 2) int-valued
    spatch = extract_patches(img_cur, base, S)

    def body(_, carry):
        flow, converged = carry
        # window top-left inside the search patch
        off = (kps_lvl + flow) - r - base
        I = sample_window(spatch, off, win)
        diff = T - I
        bx = jnp.sum(Ix * diff, axis=(-2, -1))
        by = jnp.sum(Iy * diff, axis=(-2, -1))
        dx = iA * bx + iB * by
        dy = iB * bx + iD * by
        step_ok = (~converged) & alive & good_g
        flow = jnp.where(step_ok[:, None],
                         flow + jnp.stack([dx, dy], -1), flow)
        converged = converged | (dx * dx + dy * dy < eps * eps)
        return flow, converged

    flow, _ = jax.lax.fori_loop(
        0, iters, body, (flow, jnp.zeros(flow.shape[0], bool)))

    centers = kps_lvl + flow
    in_img = (
        (centers[:, 0] >= r) & (centers[:, 0] <= W - 1 - r)
        & (centers[:, 1] >= r) & (centers[:, 1] <= H - 1 - r)
    )
    # final residual (clamped into the search patch like the iterations)
    I = sample_window(spatch, centers - r - base, win)
    residual = jnp.mean(jnp.abs(I - T), axis=(-2, -1))
    alive = alive & good_g & in_img
    return flow, alive, min_eig, residual


@partial(jax.jit, static_argnames=("win", "iters", "margin"))
def klt_track(
    pyr_prev: Tuple[jnp.ndarray, ...],
    pyr_cur: Tuple[jnp.ndarray, ...],
    kps, priors, valid,
    win: int = 9, iters: int = 30, eps: float = 0.01,
    min_eig_th: float = 1e-4, max_err: float = 30.0, margin: int = 5,
):
    """Forward pyramidal KLT with priors.

    Args:
      pyr_prev/pyr_cur: tuples of level images, level 0 first.
      kps: (N, 2) positions in prev frame (level-0 px).
      priors: (N, 2) initial guesses in cur frame (level-0 px).
      valid: (N,) bool.

    Returns:
      (tracked (N, 2), status (N,), residual (N,))
    """
    levels = len(pyr_prev)
    dtype = pyr_prev[0].dtype
    flow = (priors - kps) / (2.0 ** (levels - 1))
    alive = valid
    residual = jnp.zeros(kps.shape[0], dtype)

    for lvl in range(levels - 1, -1, -1):
        scale = 2.0 ** lvl
        kps_lvl = kps / scale
        flow, alive, min_eig, residual = track_level(
            pyr_prev[lvl], pyr_cur[lvl], kps_lvl, flow, alive,
            win, iters, eps, min_eig_th, margin)
        if lvl > 0:
            flow = flow * 2.0

    status = alive & (residual < max_err)
    return kps + flow, status, residual


@partial(jax.jit, static_argnames=("win", "iters", "margin", "n_sub",
                                   "n_base_levels"))
def fb_klt_track_split(
    pyr_prev: Tuple[jnp.ndarray, ...],
    pyr_cur: Tuple[jnp.ndarray, ...],
    kps, priors, valid, base_only,
    n_sub: int,
    win: int = 9, iters: int = 30, eps: float = 0.01,
    min_eig_th: float = 1e-4, max_err: float = 30.0,
    max_fb_dist: float = 0.5, margin: int = 5,
    n_base_levels: int = 1, priors2=None,
):
    """3D/2D split forward-backward KLT — the reference's two-pass
    tracking (`visual_front_end.cpp:187-271`) re-expressed for
    fixed-shape batching.

    The reference fb-tracks 3D map points over ONE pyramid level, seeded
    by their projected prior; 2D keypoints AND any 3D kp that failed the
    prior pass are then fb-tracked over the full pyramid from their
    previous position (the prior already failed — pass 2 deliberately
    does not reuse it). Half the per-frame KLT level-loop work at the
    operating point, and better turn robustness (projected priors don't
    drift through coarse levels the way pyramid initialization does).

    Fixed-shape version:
      pass 1: base-level-only forward + backward + fb gate, prior-
              seeded, ALL N rows. The fb gate INSIDE the pass matters:
              under a bad prior the base level often false-converges
              within the search margin with an acceptable residual, and
              without the gate those rows would skip their pyramid
              retry only to die downstream.
      pass 2: all 2D kps and the fb failures of pass 1, compacted
              (stable argsort gather) into an ``n_sub``-row batch that
              runs the full fb pyramid from px.
    Total level-loop rows: 2N + (levels+1)*n_sub vs (levels+1)*N for
    fb_klt_track (~10% less at n_sub = N/2, levels = 4, plus most rows
    never touch the upper pyramid). Overflow (more than n_sub failures —
    e.g. right after bootstrapping, before triangulation) degrades
    gracefully: the extras keep their (failed) pass-1 status and are
    re-detected at the next keyframe.

    Returns (tracked (N, 2), status (N,)) — status is fb-validated;
    callers must NOT run another backward pass on top.
    """
    N = kps.shape[0]
    # pass 1: prior-seeded fb over the bottom ``n_base_levels`` (1 for
    # frame-to-frame, 2 for from-keyframe tracking where the projected
    # prior absorbs a multi-frame displacement — `visual_front_end.cpp:
    # 290` "track 3d kps on only 2 levels"); backward stays base-only
    base_prev = tuple(pyr_prev[:n_base_levels])
    base_cur = tuple(pyr_cur[:n_base_levels])
    fwd1, st1f, _ = klt_track(
        base_prev, base_cur, kps, priors, valid,
        win=win, iters=iters, eps=eps, min_eig_th=min_eig_th,
        max_err=max_err, margin=margin)
    bwd1, st1b, _ = klt_track(
        (base_cur[0],), (base_prev[0],), fwd1, kps, st1f,
        win=win, iters=iters, eps=eps, min_eig_th=min_eig_th,
        max_err=max_err, margin=margin)
    st1 = st1f & st1b & (jnp.linalg.norm(bwd1 - kps, axis=-1)
                         <= max_fb_dist)

    # pass 2 membership: ALL 2D kps (reference semantics — without a
    # projected prior, a base-level track can false-converge onto an
    # fb-consistent wrong minimum within the search margin; only the
    # pyramid resolves large flows) plus prior-pass failures. For 3D
    # kps the prior bounds the error: a false minimum is clamped to
    # within ``margin`` px of a ~1px-accurate projection, and the
    # epipolar/PnP chi2 gates downstream kill those, as in the
    # reference.
    need2 = valid & ((~base_only) | (~st1))
    idx = jnp.argsort(~need2, stable=True)[:n_sub]
    s_sel = need2[idx]
    s_kps = kps[idx]
    # pass-2 seeds: the kp's own position for frame-to-frame (the prior
    # already failed); from-KF callers pass the CURRENT tracked position
    # as ``priors2`` (`visual_front_end.cpp:385-388` — the KF->cur
    # displacement can span many frames, the pyramid alone can't)
    p2 = s_kps if priors2 is None else priors2[idx]
    fwd2, st2 = fb_klt_track(
        pyr_prev, pyr_cur, s_kps, p2, s_sel,
        win=win, iters=iters, eps=eps, min_eig_th=min_eig_th,
        max_err=max_err, max_fb_dist=max_fb_dist, margin=margin)

    # merge: pass-2 result wins for its rows; everyone else keeps pass 1
    fwd = jnp.where(st1[:, None], fwd1, kps)
    fwd = fwd.at[idx].set(jnp.where(s_sel[:, None], fwd2, fwd[idx]))
    status = st1.at[idx].set(jnp.where(s_sel, st2, st1[idx]))
    return fwd, status


@partial(jax.jit, static_argnames=("win", "iters", "back_levels", "margin"))
def fb_klt_track(
    pyr_prev: Tuple[jnp.ndarray, ...],
    pyr_cur: Tuple[jnp.ndarray, ...],
    kps, priors, valid,
    win: int = 9, iters: int = 30, eps: float = 0.01,
    min_eig_th: float = 1e-4, max_err: float = 30.0,
    max_fb_dist: float = 0.5, back_levels: int = 1, margin: int = 5,
):
    """Forward-backward KLT: full fbKltTracking equivalence.

    Forward over the whole pyramid, backward over ``back_levels`` (the
    reference uses 1 = base level only, `feature_tracker.cpp:113-116`),
    then the fb-distance gate.

    Returns (tracked (N, 2), status (N,)).
    """
    fwd, st_f, _ = klt_track(pyr_prev, pyr_cur, kps, priors, valid,
                             win=win, iters=iters, eps=eps,
                             min_eig_th=min_eig_th, max_err=max_err,
                             margin=margin)
    back_pyr_cur = tuple(pyr_cur[:back_levels])
    back_pyr_prev = tuple(pyr_prev[:back_levels])
    bwd, st_b, _ = klt_track(back_pyr_cur, back_pyr_prev, fwd, kps, st_f,
                             win=win, iters=iters, eps=eps,
                             min_eig_th=min_eig_th, max_err=max_err,
                             margin=margin)
    fb_dist = jnp.linalg.norm(bwd - kps, axis=-1)
    status = st_f & st_b & (fb_dist <= max_fb_dist)
    return fwd, status
