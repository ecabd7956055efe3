"""Branch-free quartic root solver for torus intersection.

Replaces the reference's `roots::find_roots_quartic` (torus.rs:59) with a
Ferrari/resolvent-cubic solve written in masked vector math so it jits,
vmaps, and differentiates. Roots are polished with Newton iterations to
recover accuracy in float32.

Returns all real roots with a validity mask; callers apply the torus's
t > 0 filter (torus.rs:62-90).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_TINY = 1e-12


def _safe_div(a, b):
    denom = jnp.where(jnp.abs(b) < _TINY, jnp.where(b < 0, -_TINY, _TINY), b)
    return a / denom


@jax.custom_jvp
def _gsqrt(x):
    """sqrt with a CLAMPED derivative: sqrt'(0) = inf, and the solver
    evaluates sqrt at exact zeros on its inactive branches (disc = 0,
    y = 0 resolvent roots) whose values are masked by jnp.where — but
    0 * inf = NaN in the cotangent, which poisoned every torus-scene
    gradient (round-5 dryrun). Primal values are EXACT."""
    return jnp.sqrt(x)


@_gsqrt.defjvp
def _gsqrt_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    y = jnp.sqrt(x)
    return y, t * (0.5 / jnp.maximum(y, 1e-12))


@jax.custom_jvp
def _gcbrt(x):
    """cbrt with a clamped derivative (cbrt'(0) = inf; same NaN trap
    as _gsqrt). Primal values are EXACT."""
    return jnp.cbrt(x)


@_gcbrt.defjvp
def _gcbrt_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    y = jnp.cbrt(x)
    return y, t / jnp.maximum(3.0 * y * y, 1e-12)


@jax.custom_jvp
def _gacos(x):
    """arccos with a clamped derivative (arccos'(±1) = ∓inf; the
    resolvent's argument clips to exactly ±1 whenever the cubic
    discriminant lands on 0 — same masked-branch NaN trap as _gsqrt).
    Primal values are EXACT."""
    return jnp.arccos(x)


@_gacos.defjvp
def _gacos_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    d = -1.0 / _gsqrt(jnp.maximum(1.0 - x * x, 1e-12))
    return jnp.arccos(x), t * d


def _cos_third_acos(arg):
    """cos(arccos(arg) / 3) for arg in [-1, 1] WITHOUT trig: the largest
    root of 4c^3 - 3c = arg on [0.5, 1] (triple-angle identity). Newton
    from c=1 converges monotonically (f convex, f(1) = 1 - arg >= 0);
    needed because Mosaic has no acos/cos lowering and the quartic's
    Newton polish cleans up the tail anyway."""
    c = jnp.ones_like(arg)
    for _ in range(8):
        f = (4.0 * c * c - 3.0) * c - arg
        df = jnp.maximum(12.0 * c * c - 3.0, 1e-3)
        c = c - f / df
    return c


def _cbrt_safe(x):
    """Mosaic-safe cbrt via exp/log + one Newton step."""
    ax = jnp.maximum(jnp.abs(x), _TINY)
    r = jnp.exp(jnp.log(ax) / 3.0)
    r = r - (r * r * r - ax) / (3.0 * r * r)
    return jnp.sign(x) * jnp.where(jnp.abs(x) < _TINY, 0.0, r)


def _largest_real_cubic_root(b, c, d, safe_transcendentals=False):
    """Largest real root of y^3 + b y^2 + c y + d = 0 (always >= 1 real root).

    safe_transcendentals=True substitutes Newton/exp-log forms for
    acos/cos/cbrt (unimplemented in Mosaic's Pallas TPU lowering); the
    callers' quartic Newton polish makes the two variants agree to f32
    noise (pinned by a unit test)."""
    # Depress: y = w - b/3
    shift = b / 3.0
    p = c - b * b / 3.0
    q = 2.0 * b * b * b / 27.0 - b * c / 3.0 + d

    # Trig method for 3 real roots; Cardano for 1.
    disc = 4.0 * p * p * p + 27.0 * q * q
    three_real = disc <= 0.0

    # --- three real roots (p <= 0 here) ---
    p_neg = jnp.minimum(p, -_TINY)
    m = 2.0 * _gsqrt(-p_neg / 3.0)
    arg = jnp.clip(3.0 * q / (p_neg * m), -1.0, 1.0)
    if safe_transcendentals:
        w_tri = m * _cos_third_acos(arg)
    else:
        theta = _gacos(arg) / 3.0
        w_tri = m * jnp.cos(theta)  # k=0 branch gives the largest root

    # --- one real root (Cardano) ---
    disc_pos = jnp.maximum(disc / 108.0, 0.0)  # (q/2)^2 + (p/3)^3
    sq = _gsqrt(disc_pos)
    u3 = -q / 2.0 + sq
    v3 = -q / 2.0 - sq
    cbrt = _cbrt_safe if safe_transcendentals else _gcbrt
    w_card = cbrt(u3) + cbrt(v3)

    w = jnp.where(three_real, w_tri, w_card)
    return w - shift


def _quadratic(b, c):
    """Roots of x^2 + b x + c, with validity mask."""
    disc = b * b - 4.0 * c
    ok = disc >= 0.0
    s = _gsqrt(jnp.maximum(disc, 0.0))
    # Numerically stable pairing.
    qq = -0.5 * (b + jnp.sign(b) * s)
    r1 = jnp.where(jnp.abs(b) < _TINY, -0.5 * s, qq)
    r2 = jnp.where(jnp.abs(b) < _TINY, 0.5 * s, _safe_div(c, qq))
    return r1, r2, ok


def solve_quartic_parts(c4, c3, c2, c1, c0, polish_iters: int = 3,
                        safe_transcendentals: bool = False):
    """All real roots of c4 x^4 + ... + c0 = 0 as four separate arrays.

    Returns (roots, valids): two 4-tuples of arrays shaped like the
    coefficients — the SoA form (no stacked minor axis; see ops/vec.py),
    which is also the only form Mosaic can lower (a stacked [..., 4]
    minor axis is a 3D array inside a Pallas kernel). Invalid lanes hold
    junk. safe_transcendentals swaps acos/cos/cbrt for Mosaic-lowerable
    forms (Pallas TPU kernels).
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
    y = _largest_real_cubic_root(2.0 * p, p * p - 4.0 * r, -q * q,
                                 safe_transcendentals)
    y = jnp.maximum(y, 0.0)
    s = _gsqrt(y)

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
    sz1 = _gsqrt(jnp.maximum(z1, 0.0))
    sz2 = _gsqrt(jnp.maximum(z2, 0.0))

    shift = b / 4.0
    roots = [
        jnp.where(biquad, sz1, r1a) - shift,
        jnp.where(biquad, -sz1, r1b) - shift,
        jnp.where(biquad, sz2, r2a) - shift,
        jnp.where(biquad, -sz2, r2b) - shift,
    ]
    # Logical ops, not jnp.where-on-bools: Mosaic cannot lower an i1
    # select ("unsupported target bitwidth for truncation").
    valid12 = (biquad & bq1ok) | (~biquad & ok1)
    valid34 = (biquad & bq2ok) | (~biquad & ok2)
    valids = (valid12, valid12, valid34, valid34)

    # Newton polish on the original quartic, per root array.
    for i in range(4):
        x = roots[i]
        for _ in range(polish_iters):
            f = (((c4 * x + c3) * x + c2) * x + c1) * x + c0
            df = ((4.0 * c4 * x + 3.0 * c3) * x + 2.0 * c2) * x + c1
            step = jnp.clip(_safe_div(f, df), -1.0, 1.0)
            x = x - jnp.where(valids[i], step, 0.0)
        roots[i] = x

    return tuple(roots), valids


def solve_quartic(c4, c3, c2, c1, c0, polish_iters: int = 3,
                  safe_transcendentals: bool = False):
    """All real roots of c4 x^4 + c3 x^3 + c2 x^2 + c1 x + c0 = 0.

    Returns (roots[..., 4], valid[..., 4]). Invalid lanes hold junk.
    """
    roots, valids = solve_quartic_parts(c4, c3, c2, c1, c0, polish_iters,
                                        safe_transcendentals)
    return jnp.stack(roots, axis=-1), jnp.stack(valids, axis=-1)
