"""BRIEF-256 binary descriptors, batched over keypoints.

TPU-native replacement for `FeatureExtractor::describeBRIEF`
(`src/feature_extractor.cpp:224-285`): classic (non-rotated) BRIEF as in
the reference's primary path (cv::xfeatures2d::BriefDescriptorExtractor,
256 bits). The sampling pattern is a fixed Gaussian-distributed pair set
(Calonder et al., GII pattern: N(0, patch²/25)) generated once from a fixed
seed.

Performance design: point-gathers are slow on TPU (~32 ns/elem), so the
descriptor is computed as two MXU matmuls:
1. per-keypoint patch extraction (`ops/patch.extract_patches`, itself two
   GEMMs with bilinear weights), then
2. pattern sampling as one GEMM with a precomputed sparse-in-dense
   (512, P²) bilinear weight matrix — all 512 sample points of all
   keypoints in one (N, P²) x (P², 512) matmul.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.image import gaussian_blur
from .patch import extract_patches

N_BITS = 256
N_WORDS = N_BITS // 32
PATCH_SIZE = 31
_P = PATCH_SIZE + 2  # patch side incl. bilinear margin
_HALF = PATCH_SIZE // 2


def _make_pattern(seed: int = 7) -> np.ndarray:
    """(256, 2, 2) float32 sampling-pair offsets, clipped to the patch."""
    rng = np.random.default_rng(seed)
    sigma = PATCH_SIZE / 5.0
    pts = rng.normal(0.0, sigma, size=(N_BITS, 2, 2)).astype(np.float32)
    return np.clip(pts, -_HALF, _HALF)


def _make_sample_matrix(pattern: np.ndarray) -> np.ndarray:
    """(512, _P * _P) bilinear sampling matrix over the patch grid.

    Row k holds the 4 bilinear weights of sample point k; multiplying the
    flattened patch by its transpose evaluates every pattern point.
    """
    pts = pattern.reshape(-1, 2)  # (512, 2) xy offsets from kp center
    W = np.zeros((pts.shape[0], _P * _P), np.float32)
    # patch grid covers offsets [-_HALF-1, _HALF+1]
    px = pts[:, 0] + _HALF + 1
    py = pts[:, 1] + _HALF + 1
    x0 = np.floor(px).astype(int)
    y0 = np.floor(py).astype(int)
    fx = px - x0
    fy = py - y0
    for k in range(pts.shape[0]):
        for dy, wy in ((0, 1 - fy[k]), (1, fy[k])):
            for dx, wx in ((0, 1 - fx[k]), (1, fx[k])):
                W[k, (y0[k] + dy) * _P + (x0[k] + dx)] += wy * wx
    return W


_PATTERN = _make_pattern()
_SAMPLE_MATRIX = _make_sample_matrix(_PATTERN)


@partial(jax.jit, static_argnames=())
def describe_brief(img, kps, valid):
    """Compute BRIEF-256 descriptors.

    Args:
      img: (H, W) f32 image (raw; smoothing applied internally).
      kps: (N, 2) xy keypoint positions.
      valid: (N,) bool.

    Returns:
      desc: (N, 8) uint32 packed descriptors (zeros where invalid).
      ok: (N,) bool — valid and fully inside the image.
    """
    H, W = img.shape
    smoothed = gaussian_blur(img, sigma=2.0, radius=4)

    patches = extract_patches(smoothed, kps - (_HALF + 1), _P)  # (N,_P,_P)
    S = jnp.asarray(_SAMPLE_MATRIX)
    samples = patches.reshape(-1, _P * _P) @ S.T                # (N, 512)
    # pattern rows are interleaved (pair k -> samples 2k, 2k+1)
    va = samples[:, 0::2]
    vb = samples[:, 1::2]
    bits = va < vb                                              # (N, 256)

    half = _HALF + 2
    inside = (
        (kps[:, 0] >= half) & (kps[:, 0] < W - half)
        & (kps[:, 1] >= half) & (kps[:, 1] < H - half)
    )
    ok = valid & inside

    weights = (2 ** jnp.arange(32, dtype=jnp.uint32))
    words = jnp.sum(
        bits.reshape(-1, N_WORDS, 32).astype(jnp.uint32) * weights[None, None],
        axis=-1, dtype=jnp.uint32)
    return jnp.where(ok[:, None], words, 0), ok
