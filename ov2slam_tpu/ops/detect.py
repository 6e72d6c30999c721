"""Grid-bucketed corner detection, batched over cells.

TPU-native replacement for `FeatureExtractor`
(`src/feature_extractor.cpp`): the reference loops grid cells with
`cv::parallel_for_` (`:334-392` Shi-Tomasi single-scale, `:492-534` FAST);
here the response is computed for the whole image with convolutions and the
per-cell top-1 selection is a single reshaped argmax — the natural data
parallelism over cells that the reference approximates with threads.

Reference semantics kept:
- cells containing a currently-tracked keypoint are skipped
  (`feature_extractor.cpp:312-323` voccupcells),
- pixels within cellsize/4 of an existing keypoint are masked
  (`:314-316` cv::circle mask),
- response threshold relative to the per-image max (quality level), with
  host-side adaptive update of the quality (`:418-423`, `:546-552`),
- sub-pixel corner refinement (`:559-570` cornerSubPix) via quadratic fit.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.image import box_filter, scharr_gradients


# --------------------------------------------------------------------------
# Response images
# --------------------------------------------------------------------------

def shi_tomasi_response(img, block: int = 3):
    """Min-eigenvalue of the structure tensor (cv::cornerMinEigenVal)."""
    gx, gy = scharr_gradients(img)
    gxx = box_filter(gx * gx, block)
    gxy = box_filter(gx * gy, block)
    gyy = box_filter(gy * gy, block)
    tr = gxx + gyy
    det = gxx * gyy - gxy * gxy
    return (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / 2.0


# standard Bresenham circle of radius 3 (16 px), (dx, dy):
_FAST_OFFSETS = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)


def fast_response(img, threshold: float, arc: int = 9):
    """FAST-N corner response (0 where not a corner, else SAD-style score).

    Branch-free formulation: build 16 shifted copies of the image, compute
    brighter/darker boolean rings, test all 16 contiguous arcs of length
    ``arc`` with AND-reductions, and score corners by the sum of absolute
    circle differences exceeding the threshold (OpenCV's FAST score).
    """
    H, W = img.shape
    pad = 3
    p = jnp.pad(img, pad, mode="edge")
    ring = jnp.stack(
        [p[pad + dy:pad + dy + H, pad + dx:pad + dx + W]
         for (dx, dy) in _FAST_OFFSETS], axis=0)  # (16, H, W)

    diff = ring - img[None]
    brighter = diff > threshold
    darker = diff < -threshold

    def has_arc(flags):
        # pack the 16 ring flags into one uint32 per pixel, then test all 16
        # rotations of a contiguous ``arc``-bit mask — 16 compares on the
        # packed image instead of 16*arc boolean ANDs.
        weights = (1 << jnp.arange(16, dtype=jnp.uint32))
        packed = jnp.sum(
            flags.astype(jnp.uint32) * weights[:, None, None], axis=0)
        out = jnp.zeros(flags.shape[1:], bool)
        base = (1 << arc) - 1
        for s in range(16):
            mask = ((base << s) | (base >> (16 - s))) & 0xFFFF
            m = jnp.uint32(mask)
            out = out | ((packed & m) == m)
        return out

    is_corner = has_arc(brighter) | has_arc(darker)
    score = jnp.sum(jnp.maximum(jnp.abs(diff) - threshold, 0.0), axis=0)
    return jnp.where(is_corner, score, 0.0)


# --------------------------------------------------------------------------
# Grid selection
# --------------------------------------------------------------------------

def _subpix_quadratic(resp_pad, px, py):
    """Sub-pixel peak refinement by 1D quadratic fits on the 3x3 response
    neighborhood (cornerSubPix stand-in; exact for locally parabolic peaks)."""
    c = resp_pad[py + 1, px + 1]
    l = resp_pad[py + 1, px]
    r = resp_pad[py + 1, px + 2]
    u = resp_pad[py, px + 1]
    d = resp_pad[py + 2, px + 1]
    denx = l - 2 * c + r
    deny = u - 2 * c + d
    dx = jnp.where(jnp.abs(denx) > 1e-9, 0.5 * (l - r) / denx, 0.0)
    dy = jnp.where(jnp.abs(deny) > 1e-9, 0.5 * (u - d) / deny, 0.0)
    return jnp.clip(dx, -0.5, 0.5), jnp.clip(dy, -0.5, 0.5)


@partial(jax.jit, static_argnames=("cell_size", "max_out", "refine",
                                   "two_pass"))
def grid_detect(
    response,
    existing_kps,
    existing_valid,
    quality_th,
    cell_size: int,
    max_out: int,
    refine: bool = True,
    two_pass: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-cell top-1 detection with occupancy masking.

    Args:
      response: (H, W) corner response image.
      existing_kps: (M, 2) xy of currently tracked keypoints.
      existing_valid: (M,) bool.
      quality_th: absolute response threshold (caller scales by image max
        for the relative-quality semantics).
      cell_size: grid cell size in px (nmaxdist).
      max_out: static output capacity (>= number of cells).
      two_pass: GFTT fill-in semantics (`feature_extractor.cpp:104-221`):
        candidates above quality_th rank first, but cells whose best
        response only clears quality_th/2 are still filled (the
        reference's second `goodFeaturesToTrack` pass at halved quality).

    Returns:
      kps (max_out, 2) xy, scores (max_out,), valid (max_out,) —
      sorted by score descending.
    """
    H, W = response.shape
    gy, gx = H // cell_size, W // cell_size

    # existing keypoints, far-away sentinel where invalid
    radius = cell_size / 4.0
    ex = jnp.where(existing_valid[:, None], existing_kps,
                   jnp.full_like(existing_kps, -1e6))
    masked = response

    # occupied cells (cell of any existing kp) are skipped entirely
    cell_ids = (jnp.clip(ex[:, 1] // cell_size, 0, gy - 1).astype(jnp.int32)
                * gx
                + jnp.clip(ex[:, 0] // cell_size, 0, gx - 1).astype(jnp.int32))
    cell_ids = jnp.where(existing_valid, cell_ids, gy * gx)  # OOB → dropped
    occupied = (
        jnp.zeros((gy * gx,), jnp.int32)
        .at[cell_ids].add(1, mode="drop")
    ) > 0

    # per-cell argmax via reshape
    crop = masked[: gy * cell_size, : gx * cell_size]
    cells = crop.reshape(gy, cell_size, gx, cell_size).transpose(0, 2, 1, 3)
    cells = cells.reshape(gy * gx, cell_size * cell_size)
    best = jnp.argmax(cells, axis=-1)
    score = jnp.take_along_axis(cells, best[:, None], axis=-1)[:, 0]

    by = best // cell_size
    bx = best % cell_size
    cy = jnp.arange(gy * gx) // gx
    cx = jnp.arange(gy * gx) % gx
    px = (cx * cell_size + bx).astype(jnp.int32)
    py = (cy * cell_size + by).astype(jnp.int32)

    # candidate-level proximity mask: drop a cell's winner if it lies
    # within cellsize/4 of an existing keypoint (cheap (cells, M) distance
    # test replacing the reference's per-pixel circle mask,
    # `feature_extractor.cpp:314-316` — occupied-cell skipping already
    # removes the bulk; this handles cell borders)
    cand = jnp.stack([px.astype(response.dtype),
                      py.astype(response.dtype)], -1)     # (cells, 2)
    d2 = jnp.sum((cand[:, None, :] - ex[None, :, :]) ** 2, axis=-1)
    near_existing = (d2 < radius * radius).any(axis=1)

    accept_th = quality_th / 2.0 if two_pass else quality_th
    ok = (score > accept_th) & (~occupied) & (~near_existing)

    if refine:
        resp_pad = jnp.pad(response, 1, mode="edge")
        dx, dy = _subpix_quadratic(resp_pad, px, py)
    else:
        dx = dy = jnp.zeros_like(score)

    kps = jnp.stack([px + dx, py + dy], axis=-1)

    # rank by score, pad/truncate to max_out; in two-pass mode first-pass
    # candidates (above the full quality) outrank second-pass fill-ins
    rank_score = score
    if two_pass:
        bonus = jnp.where(score > quality_th,
                          jnp.full_like(score, 1e30), 0.0)
        rank_score = score + bonus
    order = jnp.argsort(jnp.where(ok, -rank_score, jnp.inf))
    kps = kps[order][:max_out]
    score = score[order][:max_out]
    ok = ok[order][:max_out]

    # cross-cell NMS: a corner straddling a cell border can fire in both
    # neighboring cells; suppress any candidate within the mask radius of a
    # higher-ranked one (the reference dedupes these later in the Frame
    # occupancy grid, `frame.cpp:508-651`).
    d2 = jnp.sum((kps[:, None, :] - kps[None, :, :]) ** 2, axis=-1)
    n = kps.shape[0]
    higher = (jnp.arange(n)[None, :] < jnp.arange(n)[:, None])
    clash = (d2 < radius * radius) & higher & ok[None, :]
    ok = ok & ~clash.any(axis=1)
    pad = max_out - kps.shape[0]
    if pad > 0:
        kps = jnp.pad(kps, ((0, pad), (0, 0)))
        score = jnp.pad(score, (0, pad))
        ok = jnp.pad(ok, (0, pad))
    return kps, score, ok


def _bilinear_scalar(im, x, y):
    """Bilinear image sample at fractional (x, y), edge-clamped."""
    H, W = im.shape
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = im[y0, x0]
    v01 = im[y0, x0 + 1]
    v10 = im[y0 + 1, x0]
    v11 = im[y0 + 1, x0 + 1]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


@partial(jax.jit, static_argnames=("half_win", "iters"))
def corner_subpix(img, kps, valid, half_win: int = 3, iters: int = 5):
    """Iterative sub-pixel corner refinement (cv::cornerSubPix semantics,
    used by `detectGFTT`, `feature_extractor.cpp:190-218`).

    For an ideal corner q, every window gradient satisfies
    ∇I_iᵀ (q − p_i) = 0, so q solves G q = b with
    G = Σ w ∇I∇Iᵀ and b = Σ w ∇I∇Iᵀ p. The reference iterates until the
    movement drops below 0.01 px; here a fixed ``iters`` count (vmapped
    over keypoints, bilinear gradient gathers) — each step is a full
    linear solve, so convergence is quadratic and 5 steps ≫ suffice.
    Diverging refinements (total move > half_win) fall back to the input.
    """
    gx, gy = scharr_gradients(img)
    r = jnp.arange(-half_win, half_win + 1, dtype=img.dtype)
    ox, oy = jnp.meshgrid(r, r, indexing="xy")
    off = jnp.stack([ox.ravel(), oy.ravel()], -1)           # (K, 2)
    w = jnp.exp(-(off ** 2).sum(-1) / (2.0 * (half_win / 2.0) ** 2))

    def refine_one(c0):
        def step(c, _):
            px = c[0] + off[:, 0]
            py = c[1] + off[:, 1]
            gxs = _bilinear_scalar(gx, px, py)
            gys = _bilinear_scalar(gy, px, py)
            a = (w * gxs * gxs).sum()
            b = (w * gxs * gys).sum()
            d = (w * gys * gys).sum()
            bx = (w * (gxs * gxs * px + gxs * gys * py)).sum()
            by = (w * (gxs * gys * px + gys * gys * py)).sum()
            det = a * d - b * b
            ok = jnp.abs(det) > 1e-9
            qx = jnp.where(ok, (d * bx - b * by) / det, c[0])
            qy = jnp.where(ok, (-b * bx + a * by) / det, c[1])
            # bound the per-step move for stability on flat windows
            qx = c[0] + jnp.clip(qx - c[0], -1.0, 1.0)
            qy = c[1] + jnp.clip(qy - c[1], -1.0, 1.0)
            return jnp.stack([qx, qy]), None

        c, _ = jax.lax.scan(step, c0, None, length=iters)
        return c

    out = jax.vmap(refine_one)(kps)
    moved = jnp.linalg.norm(out - kps, axis=-1)
    keep = (moved <= half_win) & valid
    return jnp.where(keep[:, None], out, kps)


@partial(jax.jit, static_argnames=("cell_size", "max_out"))
def detect_gftt(img, existing_kps, existing_valid, quality_level,
                cell_size: int, max_out: int):
    """GFTT detection (`detectGFTT`, `feature_extractor.cpp:104-221`):
    masked Shi-Tomasi, TWO-pass fill-in (second pass at halved quality
    for cells the first pass leaves empty), then iterative cornerSubPix
    refinement on the image — the reference's 'average' profile detector
    (`use_shi_tomasi`, `map_manager.cpp:312-314`). One fused jit."""
    resp = shi_tomasi_response(img)
    th = quality_level * jnp.max(resp)
    kps, scores, ok = grid_detect(resp, existing_kps, existing_valid, th,
                                  cell_size=cell_size, max_out=max_out,
                                  refine=True, two_pass=True)
    kps = corner_subpix(img, kps, ok)
    return kps, scores, ok


@partial(jax.jit, static_argnames=("cell_size", "max_out"))
def detect_single_scale(img, existing_kps, existing_valid, quality_level,
                        cell_size: int, max_out: int):
    """Shi-Tomasi single-scale grid detection (detectSingleScale,
    `feature_extractor.cpp:288-440`). quality_level is relative to the
    image's max response, like cv::goodFeaturesToTrack. One fused jit:
    the response image never leaves the device."""
    resp = shi_tomasi_response(img)
    th = quality_level * jnp.max(resp)
    return grid_detect(resp, existing_kps, existing_valid, th,
                       cell_size=cell_size, max_out=max_out)


@partial(jax.jit, static_argnames=("cell_size", "max_out"))
def detect_grid_fast(img, existing_kps, existing_valid, fast_th,
                     cell_size: int, max_out: int):
    """FAST-9 grid detection (detectGridFAST,
    `feature_extractor.cpp:443-570`). One fused jit."""
    resp = fast_response(img, fast_th)
    return grid_detect(resp, existing_kps, existing_valid, 0.0,
                       cell_size=cell_size, max_out=max_out, refine=False)
