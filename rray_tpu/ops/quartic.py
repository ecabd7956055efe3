"""Branch-free quartic root solver for torus intersection.

Replaces the reference's `roots::find_roots_quartic` (torus.rs:59) with a
Ferrari/resolvent-cubic solve written in masked vector math so it jits,
vmaps, and differentiates. Roots are polished with Newton iterations to
recover accuracy in float32.

Returns all real roots with a validity mask; callers apply the torus's
t > 0 filter (torus.rs:62-90).
"""
from __future__ import annotations

import jax.numpy as jnp

_TINY = 1e-12


def _safe_div(a, b):
    denom = jnp.where(jnp.abs(b) < _TINY, jnp.where(b < 0, -_TINY, _TINY), b)
    return a / denom


def _largest_real_cubic_root(b, c, d):
    """Largest real root of y^3 + b y^2 + c y + d = 0 (always >= 1 real root)."""
    # Depress: y = w - b/3
    shift = b / 3.0
    p = c - b * b / 3.0
    q = 2.0 * b * b * b / 27.0 - b * c / 3.0 + d

    # Trig method for 3 real roots; Cardano for 1.
    disc = 4.0 * p * p * p + 27.0 * q * q
    three_real = disc <= 0.0

    # --- three real roots (p <= 0 here) ---
    p_neg = jnp.minimum(p, -_TINY)
    m = 2.0 * jnp.sqrt(-p_neg / 3.0)
    arg = jnp.clip(3.0 * q / (p_neg * m), -1.0, 1.0)
    theta = jnp.arccos(arg) / 3.0
    w_tri = m * jnp.cos(theta)  # k=0 branch gives the largest root

    # --- one real root (Cardano) ---
    disc_pos = jnp.maximum(disc / 108.0, 0.0)  # (q/2)^2 + (p/3)^3
    sq = jnp.sqrt(disc_pos)
    u3 = -q / 2.0 + sq
    v3 = -q / 2.0 - sq
    w_card = jnp.cbrt(u3) + jnp.cbrt(v3)

    w = jnp.where(three_real, w_tri, w_card)
    return w - shift


def _quadratic(b, c):
    """Roots of x^2 + b x + c, with validity mask."""
    disc = b * b - 4.0 * c
    ok = disc >= 0.0
    s = jnp.sqrt(jnp.maximum(disc, 0.0))
    # Numerically stable pairing.
    qq = -0.5 * (b + jnp.sign(b) * s)
    r1 = jnp.where(jnp.abs(b) < _TINY, -0.5 * s, qq)
    r2 = jnp.where(jnp.abs(b) < _TINY, 0.5 * s, _safe_div(c, qq))
    return r1, r2, ok


def solve_quartic_parts(c4, c3, c2, c1, c0, polish_iters: int = 3):
    """All real roots of c4 x^4 + ... + c0 = 0 as four separate arrays.

    Returns (roots, valids): two 4-tuples of arrays shaped like the
    coefficients — the SoA form (no stacked minor axis; see ops/vec.py).
    Invalid lanes hold junk.
    """
    roots, valid = solve_quartic(c4, c3, c2, c1, c0, polish_iters)
    return tuple(roots[..., i] for i in range(4)), \
        tuple(valid[..., i] for i in range(4))


def solve_quartic(c4, c3, c2, c1, c0, polish_iters: int = 3):
    """All real roots of c4 x^4 + c3 x^3 + c2 x^2 + c1 x + c0 = 0.

    Returns (roots[..., 4], valid[..., 4]). Invalid lanes hold junk.
    """
    inv4 = _safe_div(jnp.ones_like(c4), c4)
    b, c, d, e = c3 * inv4, c2 * inv4, c1 * inv4, c0 * inv4

    # Depressed quartic u^4 + p u^2 + q u + r, x = u - b/4.
    b2 = b * b
    p = c - 3.0 * b2 / 8.0
    q = d - b * c / 2.0 + b2 * b / 8.0
    r = e - b * d / 4.0 + b2 * c / 16.0 - 3.0 * b2 * b2 / 256.0

    # Resolvent cubic: y^3 + 2p y^2 + (p^2 - 4r) y - q^2 = 0; pick largest
    # real root (guaranteed >= 0 at the max).
    y = _largest_real_cubic_root(2.0 * p, p * p - 4.0 * r, -q * q)
    y = jnp.maximum(y, 0.0)
    s = jnp.sqrt(y)

    biquad = s < 1e-6
    # General Ferrari factorization: (u^2 + s u + t1)(u^2 - s u + t2)
    half = (p + y) / 2.0
    qs = _safe_div(q, 2.0 * s)
    t1 = half - qs
    t2 = half + qs
    r1a, r1b, ok1 = _quadratic(s, jnp.where(biquad, jnp.zeros_like(t1), t1))
    r2a, r2b, ok2 = _quadratic(-s, jnp.where(biquad, jnp.zeros_like(t2), t2))

    # Biquadratic fallback (q ~ 0): u^2 = z where z^2 + p z + r = 0.
    z1, z2, okz = _quadratic(p, r)
    bq1ok = okz & (z1 >= 0.0)
    bq2ok = okz & (z2 >= 0.0)
    sz1 = jnp.sqrt(jnp.maximum(z1, 0.0))
    sz2 = jnp.sqrt(jnp.maximum(z2, 0.0))

    u_roots = jnp.stack([
        jnp.where(biquad, sz1, r1a),
        jnp.where(biquad, -sz1, r1b),
        jnp.where(biquad, sz2, r2a),
        jnp.where(biquad, -sz2, r2b),
    ], axis=-1)
    valid = jnp.stack([
        jnp.where(biquad, bq1ok, ok1),
        jnp.where(biquad, bq1ok, ok1),
        jnp.where(biquad, bq2ok, ok2),
        jnp.where(biquad, bq2ok, ok2),
    ], axis=-1)

    roots = u_roots - (b / 4.0)[..., None]

    # Newton polish on the original quartic.
    c4e, c3e, c2e, c1e, c0e = (a[..., None] for a in (c4, c3, c2, c1, c0))
    for _ in range(polish_iters):
        f = (((c4e * roots + c3e) * roots + c2e) * roots + c1e) * roots + c0e
        df = ((4.0 * c4e * roots + 3.0 * c3e) * roots + 2.0 * c2e) * roots + c1e
        step = _safe_div(f, df)
        step = jnp.clip(step, -1.0, 1.0)
        roots = roots - jnp.where(valid, step, 0.0)

    return roots, valid
