"""Gather-free patch extraction and in-patch resampling.

XLA's TPU gather lowers to ~32 ns/element scalar loads, which makes naive
per-keypoint patch gathers the bottleneck of the whole front-end (measured:
~1 ms per 31k-element gather on v5e). The TPU-native formulation turns the
gather into two MXU matmuls with *bilinear weight matrices*:

    rows[n, i, w] = Σ_y  hat(y - (y0_n + i)) · img[y, w]      (GEMM over y)
    out [n, i, j] = Σ_w  rows[n, i, w] · hat(w - (x0_n + j))  (GEMM over w)

where ``hat(d) = max(0, 1 - |d|)`` — two nonzeros per row, so the matmul
*is* exact separable bilinear interpolation. One (N·P, H)x(H, W) GEMM plus
one batched (N, P, W)x(W, P) GEMM replace N·P² random-access loads; both run
at MXU speed. Used by the KLT tracker and BRIEF descriptor.

In-patch resampling (``sample_window``) avoids gathers the same way: a
dynamic fractional window position inside a small per-keypoint patch is a
hat-weighted sum over the (static) integer shifts — pure VPU shift-blend.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _hat(d):
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


@partial(jax.jit, static_argnames=("patch_size", "patch_width"))
def extract_patches(img, top_left, patch_size: int,
                    patch_width: int | None = None):
    """Extract (N, P, Pw) patches at float (x, y) ``top_left`` positions
    with exact bilinear interpolation, as two MXU matmuls.

    ``patch_width`` defaults to ``patch_size`` (square); rectangular
    patches serve the stereo epipolar SAD scan.

    Out-of-image rows/cols read as 0 (weights vanish outside), matching
    :func:`ov2slam_tpu.core.camera.bilinear_sample`'s out-of-bounds policy.
    """
    H, W = img.shape
    N = top_left.shape[0]
    P = patch_size
    Pw = patch_width if patch_width is not None else patch_size
    dtype = img.dtype

    iy = jnp.arange(H, dtype=dtype)
    ix = jnp.arange(W, dtype=dtype)

    y_pos = top_left[:, 1:2] + jnp.arange(P, dtype=dtype)[None, :]
    x_pos = top_left[:, 0:1] + jnp.arange(Pw, dtype=dtype)[None, :]

    Wr = _hat(iy[None, None, :] - y_pos[:, :, None])     # (N, P, H)
    rows = jnp.einsum("nph,hw->npw", Wr, img,
                      preferred_element_type=dtype)      # (N, P, W)
    Wc = _hat(ix[None, None, :] - x_pos[:, :, None])     # (N, Pw, W)
    out = jnp.einsum("npw,nqw->npq", rows, Wc,
                     preferred_element_type=dtype)       # (N, P, Pw) [y, x]
    return out


def sample_window(patch, offset, out_size: int):
    """Sample an (out, out) window at float ``offset`` (x, y, patch coords,
    window top-left) from per-keypoint patches (N, S, S) — no gathers:
    separable hat-weight blend over the S-out static integer shifts.

    ``offset`` is clamped to the valid range [0, S-out]; callers detect
    margin overflow themselves if needed.
    """
    N, S, _ = patch.shape
    shifts = S - out_size
    ox = jnp.clip(offset[:, 0], 0.0, shifts)
    oy = jnp.clip(offset[:, 1], 0.0, shifts)

    rows = jnp.zeros((N, out_size, S), patch.dtype)
    for s in range(shifts + 1):
        w = _hat(s - oy)[:, None, None]
        rows = rows + w * patch[:, s:s + out_size, :]
    out = jnp.zeros((N, out_size, out_size), patch.dtype)
    for s in range(shifts + 1):
        w = _hat(s - ox)[:, None, None]
        out = out + w * rows[:, :, s:s + out_size]
    return out
