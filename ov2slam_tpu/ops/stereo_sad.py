"""Rectified-stereo epipolar SAD scan for disparity priors.

Replaces `FeatureTracker::getLineMinSAD` (`src/feature_tracker.cpp:
140-206`): for each left keypoint, scan along the same row of the right
image over a disparity range and return the SAD-minimizing position as
the stereo-matching prior (`MapManager::stereoMatching` prior stage,
`map_manager.cpp:402-489`).

Batched formulation: one rectangular patch extraction per image
(`ops/patch.extract_patches` — MXU matmuls), then all disparities of all
keypoints are scored with D statically-shifted slice differences — no
per-keypoint loops, no gathers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .patch import extract_patches


@partial(jax.jit, static_argnames=("win", "max_disp"))
def line_min_sad(img_left, img_right, kps, valid,
                 win: int = 7, max_disp: int = 100):
    """SAD-scan stereo priors for rectified pairs.

    Args:
      img_left/img_right: (H, W) rectified images.
      kps: (N, 2) left keypoint positions.
      valid: (N,) bool.
      win: SAD patch size (odd).
      max_disp: number of candidate disparities (0..max_disp-1).

    Returns:
      priors (N, 2): best right-image position (same row, x - d*).
      sad (N,): minimal mean-SAD value (for gating).
      disp (N,): winning disparity in px.
    """
    r = win // 2
    L = extract_patches(img_left, kps - r, win)                 # (N, w, w)
    # right strip covers [x - max_disp - r, x + r]
    strip = extract_patches(
        img_right, kps - jnp.asarray([max_disp + r, r], img_left.dtype),
        win, patch_width=win + max_disp)                        # (N, w, w+D)

    n_px = win * win
    sads = []
    for d in range(max_disp):
        # disparity d -> right patch starts at offset (max_disp - d)
        s = max_disp - d
        diff = jnp.abs(strip[:, :, s:s + win] - L)
        sads.append(jnp.sum(diff, axis=(1, 2)) / n_px)
    sads = jnp.stack(sads, axis=1)                              # (N, D)

    disp = jnp.argmin(sads, axis=1).astype(img_left.dtype)
    best = jnp.min(sads, axis=1)
    priors = jnp.stack([kps[:, 0] - disp, kps[:, 1]], axis=-1)
    priors = jnp.where(valid[:, None], priors, kps)
    return priors, best, disp
