"""Branch-free closed-form cubic/quartic root finders (batched, jit-safe).

TPU-native building block for minimal solvers (Kneip P3P needs the real
roots of a quartic). ``jnp.linalg.eigvals`` is CPU-only in JAX, so the usual
companion-matrix trick is unavailable on TPU; instead we use Cardano +
Ferrari in real arithmetic with ``where``-masked case selection, followed by
Newton polish for numerical accuracy. All functions map cleanly over leading
batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

_TINY = 1e-14


def _cbrt(x):
    """Real cube root, sign-preserving."""
    return jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)


def solve_cubic_real(p, q, r):
    """One real root of z³ + p z² + q z + r = 0 (batched scalars).

    Returns the largest real root (best conditioned pivot for Ferrari).
    """
    # depressed cubic t³ + A t + B, z = t - p/3
    p2 = p * p
    A = q - p2 / 3.0
    B = r - p * q / 3.0 + 2.0 * p * p2 / 27.0
    disc = (B / 2.0) ** 2 + (A / 3.0) ** 3

    # Case disc > 0: single real root via Cardano.
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_single = _cbrt(-B / 2.0 + sq) + _cbrt(-B / 2.0 - sq)

    # Case disc <= 0: three real roots; take the largest:
    # t = 2√(-A/3) cos(φ/3) with cos φ = 3B/(A·2√(-A/3)) ... standard form.
    m = jnp.sqrt(jnp.maximum(-A / 3.0, _TINY))
    cos_phi = jnp.clip(3.0 * B / (2.0 * A * jnp.where(m > 0, m, 1.0)), -1.0, 1.0)
    phi = jnp.arccos(cos_phi)
    t_triple = 2.0 * m * jnp.cos(phi / 3.0)

    t = jnp.where(disc > 0, t_single, t_triple)
    return t - p / 3.0


def solve_quartic_real(a, b, c, d, newton_iters: int = 2):
    """Real roots of x⁴ + a x³ + b x² + c x + d = 0 (batched coefficients).

    Returns ``(roots (..., 4), valid (..., 4) bool)``. Invalid slots hold a
    duplicated real root (safe to evaluate downstream; mask with ``valid``).
    """
    # Depress: x = y - a/4 → y⁴ + p y² + q y + r
    a2 = a * a
    p = b - 3.0 * a2 / 8.0
    q = c - a * b / 2.0 + a * a2 / 8.0
    r = d - a * c / 4.0 + a2 * b / 16.0 - 3.0 * a2 * a2 / 256.0

    # Resolvent cubic: m³ + p m² + (p²/4 − r) m − q²/8 = 0, take real root.
    m = solve_cubic_real(p, p * p / 4.0 - r, -q * q / 8.0)
    m = jnp.maximum(m, _TINY)  # need 2m > 0 for the factorization
    s = jnp.sqrt(2.0 * m)

    # Factor into two quadratics  y² ∓ s y + (p/2 + m ± q/(2s)).
    half = p / 2.0 + m
    qq = q / (2.0 * s)
    # y² - s y + (half + qq) = 0
    d1 = s * s / 4.0 - (half + qq)
    # y² + s y + (half - qq) = 0
    d2 = s * s / 4.0 - (half - qq)

    sq1 = jnp.sqrt(jnp.maximum(d1, 0.0))
    sq2 = jnp.sqrt(jnp.maximum(d2, 0.0))
    y = jnp.stack(
        [s / 2.0 + sq1, s / 2.0 - sq1, -s / 2.0 + sq2, -s / 2.0 - sq2],
        axis=-1,
    )
    valid = jnp.stack(
        [d1 >= 0, d1 >= 0, d2 >= 0, d2 >= 0], axis=-1
    )
    x = y - a[..., None] / 4.0

    # Newton polish on the original quartic (fixed iterations, jit-safe).
    def f(x_):
        return (((x_ + a[..., None]) * x_ + b[..., None]) * x_
                + c[..., None]) * x_ + d[..., None]

    def fp(x_):
        return ((4.0 * x_ + 3.0 * a[..., None]) * x_
                + 2.0 * b[..., None]) * x_ + c[..., None]

    for _ in range(newton_iters):
        deriv = fp(x)
        step = f(x) / jnp.where(jnp.abs(deriv) < _TINY, _TINY, deriv)
        x = jnp.where(valid, x - step, x)

    return x, valid
