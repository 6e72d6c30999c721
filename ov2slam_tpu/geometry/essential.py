"""Batched essential-matrix estimation, decomposition, and epipolar filters.

Replaces `MultiViewGeometry::compute5ptEssentialMatrix`
(`src/multi_view_geometry.cpp:594-608` + OpenGV Nister backend) and the
Sampson/fundamental helpers (`include/multi_view_geometry.hpp:121-125`).

Design note: the reference runs Nister's 5-point inside a sequential RANSAC
loop, relying on companion-matrix eigendecomposition for the degree-10
polynomial — unavailable inside TPU jit. The TPU-native formulation here
keeps the *minimal* 5-point sample (critical on planar scenes, where the
8-point algorithm is degenerate — EuRoC V-rooms are wall-dominated) but
restructures every step as fixed-shape batched array ops:

- the 10 cubic constraints (det E = 0, 2·E·EᵗE − tr(E·Eᵗ)E = 0) are
  assembled NUMERICALLY via precomputed monomial multiplication tables
  (einsum contractions), not symbolic codegen;
- Gauss–Jordan reduction is one batched 10×10 solve;
- the degree-10 determinant polynomial's real roots are found by
  sign-change bracketing + bisection under the substitution z = tan θ,
  evaluating q(θ) = cos¹⁰θ·p(tan θ) — bounded values over the WHOLE real
  line, fixed iteration counts, fully vmapped;
- every hypothesis yields up to 10 candidate E's; all candidates from all
  RANSAC samples are Sampson-scored in a single einsum, alongside a pool
  of batched 8-point hypotheses (kept as the well-conditioned fallback
  for noise-dominated, non-planar geometry).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as _np

from ..utils import lie
from .triangulation import triangulate_midpoint


def essential_from_pose(T_lr):
    """E such that x_l^T E x_r = 0 for normalized coords, from the pose of
    the right view in the left frame (x_l = R x_r + t): E = [t]x R.

    Mirrors `computeFundamentalMat12` (`multi_view_geometry.cpp` helpers)
    up to the K factors (we work in normalized camera coords).
    """
    R = lie.quat_to_matrix(lie.pose_q(T_lr))
    t = lie.pose_t(T_lr)
    tx = lie.so3_hat(t)
    return tx @ R


def sampson_dist_sq(E, x_l, x_r):
    """Squared Sampson distance (normalized coords) of correspondences under
    E (x_l^T E x_r = 0). x_l/x_r: (..., N, 2) normalized image coords.

    Mirrors `computeSampsonDistance` (`multi_view_geometry.hpp:121-125`).
    """
    ones = jnp.ones_like(x_l[..., :1])
    hl = jnp.concatenate([x_l, ones], axis=-1)
    hr = jnp.concatenate([x_r, ones], axis=-1)
    Ex_r = jnp.einsum("...ij,...nj->...ni", E, hr)
    Etx_l = jnp.einsum("...ji,...nj->...ni", E, hl)
    num = jnp.einsum("...ni,...ni->...n", hl, Ex_r) ** 2
    den = (Ex_r[..., 0] ** 2 + Ex_r[..., 1] ** 2
           + Etx_l[..., 0] ** 2 + Etx_l[..., 1] ** 2)
    return num / jnp.maximum(den, 1e-12)


def eight_point(x_l, x_r):
    """Essential matrix from ≥8 normalized correspondences (batched).

    Args:
      x_l, x_r: (..., M, 2) normalized coords (M ≥ 8).

    Returns:
      E (..., 3, 3) with singular values projected to (σ, σ, 0).
    """
    ones = jnp.ones_like(x_l[..., :1])
    hl = jnp.concatenate([x_l, ones], axis=-1)
    hr = jnp.concatenate([x_r, ones], axis=-1)
    # row per correspondence: kron(x_l, x_r) with E flattened row-major:
    # sum_ij hl_i E_ij hr_j = 0
    A = (hl[..., :, :, None] * hr[..., :, None, :]).reshape(
        x_l.shape[:-1] + (9,))
    # Null vector of A without SVD (which lowers to a slow serial
    # iterative algorithm on TPU; measured 10x+ against QR/eigh here):
    # - M = 8 (the RANSAC minimal-sample path): full QR of A^T — Q's
    #   9th column is orthogonal to all 8 rows, i.e. exactly null(A);
    # - M > 8 (overdetermined): smallest eigenvector of A^T A (9x9
    #   symmetric), the same least-squares direction SVD would return.
    if A.shape[-2] == 8:
        q, _ = jnp.linalg.qr(jnp.swapaxes(A, -2, -1), mode="complete")
        e = q[..., :, 8]
    else:
        AtA = jnp.swapaxes(A, -2, -1) @ A
        _, vecs = jnp.linalg.eigh(AtA)
        e = vecs[..., :, 0]               # ascending eigenvalues
    E = e.reshape(e.shape[:-1] + (3, 3))
    # Project onto the essential manifold (singular values -> sigma,
    # sigma, 0) WITHOUT a 3x3 SVD: eigh of E^T E gives V and s_i^2
    # (ascending), and E v_i = s_i u_i, so
    #   E_proj = sigma * (E v_2 v_2^T / s_2 + E v_1 v_1^T / s_1).
    # The dropped third term is the s_0-direction; the division is safe
    # because a valid eight-point E has s_1, s_2 ~ O(||E||) >> 0.
    EtE = jnp.swapaxes(E, -2, -1) @ E
    lam, V = jnp.linalg.eigh(EtE)
    s = jnp.sqrt(jnp.maximum(lam, 1e-20))
    sigma = 0.5 * (s[..., 2] + s[..., 1])
    v2 = V[..., :, 2]
    v1 = V[..., :, 1]
    outer = (v2[..., :, None] * v2[..., None, :] / s[..., 2, None, None]
             + v1[..., :, None] * v1[..., None, :] / s[..., 1, None, None])
    return sigma[..., None, None] * (E @ outer)


# --------------------------------------------------------------------- #
# 5-point (Nister) — batched, eigendecomposition-free
# --------------------------------------------------------------------- #
# Monomial bases over (x, y, z):
#   deg-1: [x, y, z, 1]
#   deg-2: [x2, xy, y2, xz, yz, z2, x, y, z, 1]
#   deg-3 in Nister column order — first 10 are the Gauss-Jordan pivots:
#     [x3, y3, x2y, xy2, x2z, x2, y2z, y2, xyz, xy |
#      xz2, xz, x, yz2, yz, y, z3, z2, z, 1]
_E1 = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]
_E2 = [(2, 0, 0), (1, 1, 0), (0, 2, 0), (1, 0, 1), (0, 1, 1),
       (0, 0, 2), (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]
_E3 = [(3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1),
       (2, 0, 0), (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0),
       (1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1),
       (0, 1, 0), (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0)]


def _mul_table(ea, eb, ec):
    idx = {e: i for i, e in enumerate(ec)}
    T = _np.zeros((len(ea), len(eb), len(ec)), _np.float32)
    for i, a in enumerate(ea):
        for j, b in enumerate(eb):
            T[i, j, idx[(a[0] + b[0], a[1] + b[1], a[2] + b[2])]] = 1.0
    return jnp.asarray(T)


_T112 = _mul_table(_E1, _E1, _E2)   # deg1 * deg1 -> deg2
_T213 = _mul_table(_E2, _E1, _E3)   # deg2 * deg1 -> deg3


def _pmul11(a, b):
    return jnp.einsum("...i,...j,ijk->...k", a, b, _T112)


def _pmul21(a, b):
    return jnp.einsum("...i,...j,ijk->...k", a, b, _T213)


def _conv(a, b, out_len: int):
    """Polynomial product of lowest-first coefficient vectors, padded or
    truncated to out_len (coefficients beyond the true degree are
    structurally zero)."""
    full = jnp.convolve(a, b)
    if full.shape[0] < out_len:
        return jnp.pad(full, (0, out_len - full.shape[0]))
    return full[:out_len]


def _nister_constraints(basis):
    """10x20 coefficient matrix of the 10 cubic constraints.

    basis: (4, 3, 3) null-space Es [X, Y, Z, W]; the unknown essential
    matrix is E = x·X + y·Y + z·Z + W.
    """
    # E entries as deg-1 polynomials over [x, y, z, 1]: (3, 3, 4)
    Ep = jnp.transpose(basis, (1, 2, 0))

    # det(E) = 0 (cofactor expansion through the poly tables)
    def minor2(i0, i1, j0, j1):
        return (_pmul11(Ep[i0, j0], Ep[i1, j1])
                - _pmul11(Ep[i0, j1], Ep[i1, j0]))

    det = (_pmul21(minor2(1, 2, 1, 2), Ep[0, 0])
           - _pmul21(minor2(1, 2, 0, 2), Ep[0, 1])
           + _pmul21(minor2(1, 2, 0, 1), Ep[0, 2]))

    # 2·E·Eᵗ·E − tr(E·Eᵗ)·E = 0 → nine deg-3 polynomials
    # C = E·Eᵗ (deg-2): C[i,k] = Σ_m E[i,m]·E[k,m]
    C = jnp.zeros((3, 3, 10))
    for i in range(3):
        for k in range(3):
            acc = jnp.zeros(10)
            for m in range(3):
                acc = acc + _pmul11(Ep[i, m], Ep[k, m])
            C = C.at[i, k].set(acc)
    tr = C[0, 0] + C[1, 1] + C[2, 2]
    rows = [det]
    for i in range(3):
        for j in range(3):
            acc = jnp.zeros(20)
            for k in range(3):
                acc = acc + 2.0 * _pmul21(C[i, k], Ep[k, j])
            acc = acc - _pmul21(tr, Ep[i, j])
            rows.append(acc)
    return jnp.stack(rows)   # (10, 20)


def _nister_detB(P):
    """Reduced rows → 3×3 polynomial matrix B(z) → det coefficients.

    P: (10, 10) trailing block of the Gauss-Jordan-reduced constraint
    matrix, rows indexed by the pivot monomials, columns over
    [xz2, xz, x, yz2, yz, y, z3, z2, z, 1].

    Returns (detB (11,), B builders): detB lowest-first, deg ≤ 10.
    """
    def row_polys(i):
        # x-coefficient p(z), y-coefficient q(z) (deg ≤ 2, stored len 4),
        # constant r(z) (deg ≤ 3, stored len 5); lowest-first
        p = jnp.array([P[i, 2], P[i, 1], P[i, 0], 0.0])
        q = jnp.array([P[i, 5], P[i, 4], P[i, 3], 0.0])
        r = jnp.array([P[i, 9], P[i, 8], P[i, 7], P[i, 6], 0.0])
        return p, q, r

    def zshift(c):
        return jnp.concatenate([jnp.zeros(1), c[:-1]])

    # B rows: (row_a − z·row_b) for pivot pairs (x2z, x2), (y2z, y2),
    # (xyz, xy) — the leading monomials cancel exactly
    pairs = [(4, 5), (6, 7), (8, 9)]
    B = []
    for a, b in pairs:
        pa, qa, ra = row_polys(a)
        pb, qb, rb = row_polys(b)
        B.append((pa - zshift(pb), qa - zshift(qb), ra - zshift(rb)))

    def det2(r0, r1, c0, c1):
        # 2x2 minor of B over columns c0, c1 (len-4 or len-5 polys)
        return (_conv(B[r0][c0], B[r1][c1], 11)
                - _conv(B[r0][c1], B[r1][c0], 11))

    detB = (_conv(B[0][0], det2(1, 2, 1, 2), 11)
            - _conv(B[0][1], det2(1, 2, 0, 2), 11)
            + _conv(B[0][2], det2(1, 2, 0, 1), 11))
    return detB, B


_N_GRID = 512
_MAX_ROOTS = 10
_BISECT_ITERS = 60


def _poly_tan_eval(c, theta):
    """Evaluate cos¹⁰θ · p(tan θ) for lowest-first coeffs c (11,) —
    bounded over the whole real line (θ ∈ (−π/2, π/2) ↔ z ∈ ℝ)."""
    s, co = jnp.sin(theta), jnp.cos(theta)
    # terms c_k · s^k · co^(10−k)
    sk = jnp.cumprod(jnp.full((11,) + theta.shape, s).at[0].set(1.0), axis=0)
    ck = jnp.cumprod(jnp.full((11,) + theta.shape, co).at[0].set(1.0),
                     axis=0)[::-1]
    return jnp.einsum("k,k...->...", c, sk * ck)


def _real_roots_deg10(c):
    """Real roots of a degree-≤10 polynomial (lowest-first coeffs, (11,)).

    Sign-change bracketing on a tan-spaced grid + fixed-count bisection in
    θ-space. Returns (roots (10,), valid (10,)); non-roots are NaN. Double
    roots (tangencies) are missed — harmless under RANSAC, where other
    samples cover the hypothesis.
    """
    eps = 1e-4
    theta = jnp.linspace(-jnp.pi / 2 + eps, jnp.pi / 2 - eps, _N_GRID)
    v = _poly_tan_eval(c, theta)
    sgn = jnp.sign(v)
    change = (sgn[:-1] * sgn[1:]) < 0          # (G-1,)
    # indices of the first MAX_ROOTS sign changes (stable argsort trick)
    order = jnp.argsort(~change, stable=True)[:_MAX_ROOTS]
    valid = change[order]

    lo = theta[order]
    hi = theta[order + 1]
    flo = _poly_tan_eval(c, lo)

    def body(_, state):
        lo, hi, flo = state
        mid = 0.5 * (lo + hi)
        fmid = _poly_tan_eval(c, mid)
        take_lo = (flo * fmid) > 0
        lo = jnp.where(take_lo, mid, lo)
        flo = jnp.where(take_lo, fmid, flo)
        hi = jnp.where(take_lo, hi, mid)
        return lo, hi, flo

    lo, hi, _ = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi, flo))
    roots = jnp.tan(0.5 * (lo + hi))
    # extreme roots (|z| huge) are numerically meaningless downstream
    valid = valid & (jnp.abs(roots) < 1e6)
    return jnp.where(valid, roots, jnp.nan), valid


def five_point(x_l, x_r):
    """Nister 5-point: (5, 2)+(5, 2) normalized coords → up to 10 E's.

    Returns (Es (10, 3, 3), valid (10,)); invalid slots are NaN. Batch over
    samples with vmap.
    """
    ones = jnp.ones_like(x_l[..., :1])
    hl = jnp.concatenate([x_l, ones], axis=-1)
    hr = jnp.concatenate([x_r, ones], axis=-1)
    A = (hl[:, :, None] * hr[:, None, :]).reshape(5, 9)
    # 4-dim null space via full QR of A^T (columns 5..8 of Q are
    # orthogonal to all 5 rows — exactly null(A) for a generic minimal
    # sample). Any orthonormal null basis serves the Nister
    # parameterization E = xX + yY + zZ + W; SVD's particular basis is
    # not needed, and SVD lowers to a slow serial algorithm on TPU.
    q, _ = jnp.linalg.qr(A.T, mode="complete")
    basis = q[:, 5:9].T.reshape(4, 3, 3)       # [X, Y, Z, W]

    M = _nister_constraints(basis)             # (10, 20)
    P = jnp.linalg.solve(M[:, :10], M[:, 10:])  # (10, 10)
    detB, B = _nister_detB(P)
    z, valid = _real_roots_deg10(detB)         # (10,)

    # back-substitute x, y from the top-left 2x2 of B(z)
    def polyval(c, zz):
        return jnp.polyval(c[::-1], zz)

    b = [[jax.vmap(lambda zz, cc=B[i][j]: polyval(cc, zz))(z)
          for j in range(3)] for i in range(2)]
    den = b[0][0] * b[1][1] - b[0][1] * b[1][0]
    x = (-b[0][2] * b[1][1] + b[0][1] * b[1][2]) / den
    y = (-b[0][0] * b[1][2] + b[0][2] * b[1][0]) / den

    Es = (x[:, None, None] * basis[0] + y[:, None, None] * basis[1]
          + z[:, None, None] * basis[2] + basis[3])
    norm = jnp.linalg.norm(Es.reshape(10, 9), axis=-1, keepdims=True)
    Es = Es / jnp.maximum(norm, 1e-12)[..., None]
    return jnp.where(valid[:, None, None], Es, jnp.nan), valid


def decompose_essential(E, x_l, x_r, valid_mask):
    """E → relative pose T_lr (right-in-left) by cheirality voting.

    Tests the 4 (R, t) candidates (Hartley–Zisserman) by triangulating all
    valid correspondences and counting points with positive depth in both
    views; returns the winner with unit-norm translation.
    """
    U, _, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))[..., None, None]
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))[..., None, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                  dtype=E.dtype)
    Ra = U @ W @ Vt
    Rb = U @ W.T @ Vt
    t = U[..., :, 2]

    ones = jnp.ones_like(x_l[..., :1])
    bl = jnp.concatenate([x_l, ones], axis=-1)
    bl = bl / jnp.linalg.norm(bl, axis=-1, keepdims=True)
    br = jnp.concatenate([x_r, ones], axis=-1)
    br = br / jnp.linalg.norm(br, axis=-1, keepdims=True)

    def score(R_lr, t_lr):
        # With the constraint x_l^T E x_r = 0 and E = [t]x R (for
        # x_l = R x_r + t), the H&Z candidates are directly T_lr.
        q = lie.matrix_to_quat(R_lr)
        T_lr = lie.make_pose(q, t_lr)
        pts_l = triangulate_midpoint(T_lr[None, :], bl, br)
        pts_r = lie.pose_apply(lie.pose_inverse(T_lr)[None, :], pts_l)
        ok = (pts_l[..., 2] > 0) & (pts_r[..., 2] > 0) & valid_mask
        return ok.sum(), T_lr

    cands = [(Ra, t), (Ra, -t), (Rb, t), (Rb, -t)]
    scores = []
    poses = []
    for R_, t_ in cands:
        s, T_ = score(R_, t_)
        scores.append(s)
        poses.append(T_)
    scores = jnp.stack(scores)
    poses = jnp.stack(poses)
    best = jnp.argmax(scores)
    return poses[best], scores[best]


@partial(jax.jit, static_argnames=("n_iters",))
def essential_ransac(key, x_l, x_r, valid_mask, focal, err_th_px,
                     n_iters: int = 100):
    """Batched essential RANSAC: Nister 5-point minimal samples (primary,
    per `multi_view_geometry.cpp:594-608`) plus an 8-point hypothesis pool
    (fallback for noise-dominated non-planar geometry), all candidates
    Sampson-scored together in one pass.

    Args:
      x_l, x_r: (N, 2) normalized coords of matched keypoints.
      valid_mask: (N,) bool.
      focal: scalar focal length (px) to convert err_th to normalized units.
      err_th_px: inlier threshold in pixels.
      n_iters: number of minimal samples.

    Returns:
      (E (3,3), inlier_mask (N,), n_inliers)
    """
    key5, key8 = jax.random.split(key)
    probs = valid_mask.astype(jnp.float32) + 1e-9
    logp = jnp.log(probs)

    # 5-point: n_iters samples, each yielding up to 10 candidate E's
    idx5 = jax.random.categorical(
        key5, logp[None, :].repeat(n_iters * 5, 0)).reshape(n_iters, 5)
    ok5 = valid_mask[idx5].all(axis=-1)
    E5, v5 = jax.vmap(five_point)(x_l[idx5], x_r[idx5])  # (it,10,3,3)
    E5 = E5.reshape(-1, 3, 3)
    ok5 = (ok5[:, None] & v5).reshape(-1)

    # 8-point fallback pool (quarter budget)
    n8 = max(n_iters // 4, 4)
    idx8 = jax.random.categorical(
        key8, logp[None, :].repeat(n8 * 8, 0)).reshape(n8, 8)
    ok8 = valid_mask[idx8].all(axis=-1)
    E8 = eight_point(x_l[idx8], x_r[idx8])

    E = jnp.concatenate([E5, E8], axis=0)
    cand_ok = jnp.concatenate([ok5, ok8], axis=0)
    finite = jnp.isfinite(E).all((-2, -1))
    cand_ok = cand_ok & finite
    E = jnp.where(finite[:, None, None], E, 0.0)   # 0-E scores are masked

    th = (err_th_px / focal) ** 2
    d2 = sampson_dist_sq(E, x_l[None], x_r[None])  # (C, N)
    inl = (d2 < th) & valid_mask[None, :]
    # MSAC-style truncated quality: among equal inlier counts, prefer the
    # hypothesis with the smallest residuals (ties are common when inliers
    # are low-noise and the count saturates)
    quality = jnp.where(inl, 1.0 - d2 / th, 0.0).sum(axis=-1)
    quality = jnp.where(cand_ok, quality, -1.0)
    best = jnp.argmax(quality)
    return E[best], inl[best], inl[best].sum()


def relative_pose_ransac(key, x_l, x_r, valid_mask, focal, err_th_px,
                         n_iters: int = 100):
    """Essential RANSAC + cheirality decomposition → (T_lr, inliers, n).

    This is the mono-initialization path (`checkReadyForInit`,
    `visual_front_end.cpp:855-984`): translation is unit-norm; the caller
    applies the scale convention (reference fixes ||t|| = 0.25,
    `visual_front_end.cpp:967-969`).
    """
    E, inl, n = essential_ransac(key, x_l, x_r, valid_mask, focal,
                                 err_th_px, n_iters)
    T_lr, _ = decompose_essential(E, x_l, x_r, inl)
    return T_lr, inl, n
