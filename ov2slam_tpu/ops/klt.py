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
