"""FastNoiseLite-compatible 3D Perlin noise, vectorized in JAX.

The reference samples Perlin noise through the fastnoise-lite crate with
default settings — seed 1337, frequency 0.01, NoiseType::Perlin, no 3D
rotation (noise.rs:5-9,26-29) — and layers it into fBm via octave_perlin
(noise.rs:50-63). We reimplement the hash-gradient Perlin algorithm
bit-compatibly (int32 wrapping arithmetic, the 64-entry gradient table,
quintic interpolation, the 0.96492141... output scale) so `perturbed` and
`noise` patterns match the reference renderer.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_PRIME_X = np.int32(501125321)
_PRIME_Y = np.int32(1136930381)
_PRIME_Z = np.int32(1720413743)
_HASH_MUL = np.int32(668265261)  # 0x27d4eb2d
_PERLIN_SCALE = 0.964921414852142333984375

DEFAULT_SEED = 1337
DEFAULT_FREQUENCY = 0.01

# FastNoiseLite Gradients3D: the 12 cube-edge gradients repeated 5x plus
# 4 fillers, stored as (x, y, z, 0) quads — 64 entries, indexed by
# hash & (63 << 2).
_BASE12 = [
    (0, 1, 1), (0, -1, 1), (0, 1, -1), (0, -1, -1),
    (1, 0, 1), (-1, 0, 1), (1, 0, -1), (-1, 0, -1),
    (1, 1, 0), (-1, 1, 0), (1, -1, 0), (-1, -1, 0),
]
_GRADS = _BASE12 * 5 + [(1, 1, 0), (0, -1, 1), (-1, 1, 0), (0, -1, -1)]
_GRAD_X = np.array([g[0] for g in _GRADS], dtype=np.float64)
_GRAD_Y = np.array([g[1] for g in _GRADS], dtype=np.float64)
_GRAD_Z = np.array([g[2] for g in _GRADS], dtype=np.float64)


def _grad_coord(seed, xp, yp, zp, xd, yd, zd, dtype):
    h = jnp.bitwise_xor(jnp.bitwise_xor(seed, xp), jnp.bitwise_xor(yp, zp))
    h = (h * _HASH_MUL).astype(jnp.int32)
    h = jnp.bitwise_xor(h, h >> 15)
    idx = (h & (63 << 2)) >> 2
    # The 64-entry table is closed-form: entries 0..59 are the 12 cube-edge
    # gradients (exactly one zero component, the others ±1) tiled 5x, and
    # 60..63 are four fixed fillers. Evaluating the dot product with
    # selects instead of three table gathers matters enormously on TPU:
    # gathers run ~1 element/cycle and this is called 8x per octave per
    # ray (measured 6x on the whole CSG-showcase frame).
    j = idx % 12
    k = j % 4
    one = jnp.ones_like(xd)
    s1 = jnp.where((k & 1) == 0, one, -one)
    s2 = jnp.where((k & 2) == 0, one, -one)
    g = j >> 2  # 0: x=0, 1: y=0, 2: z=0
    dot = jnp.where(g == 0, s1 * yd + s2 * zd,
                    jnp.where(g == 1, s1 * xd + s2 * zd,
                              s1 * xd + s2 * yd))
    # Fillers: (1,1,0), (0,-1,1), (-1,1,0), (0,-1,-1) for idx 60..63.
    fill = jnp.where(idx == 60, xd + yd,
                     jnp.where(idx == 61, zd - yd,
                               jnp.where(idx == 62, yd - xd, -yd - zd)))
    return jnp.where(idx >= 60, fill, dot)


def _quintic(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def _lerp(a, b, t):
    return a + t * (b - a)


def single_perlin3(x, y, z, seed: int = DEFAULT_SEED):
    """Raw Perlin at already-frequency-scaled coordinates. Shapes broadcast."""
    x = jnp.asarray(x)
    dtype = x.dtype
    seed = jnp.int32(seed)

    xf = jnp.floor(x)
    yf = jnp.floor(y)
    zf = jnp.floor(z)
    x0 = xf.astype(jnp.int32)
    y0 = yf.astype(jnp.int32)
    z0 = zf.astype(jnp.int32)

    xd0 = x - xf
    yd0 = y - yf
    zd0 = z - zf
    xd1 = xd0 - 1.0
    yd1 = yd0 - 1.0
    zd1 = zd0 - 1.0

    xs = _quintic(xd0)
    ys = _quintic(yd0)
    zs = _quintic(zd0)

    x0 = (x0 * _PRIME_X).astype(jnp.int32)
    y0 = (y0 * _PRIME_Y).astype(jnp.int32)
    z0 = (z0 * _PRIME_Z).astype(jnp.int32)
    x1 = (x0 + _PRIME_X).astype(jnp.int32)
    y1 = (y0 + _PRIME_Y).astype(jnp.int32)
    z1 = (z0 + _PRIME_Z).astype(jnp.int32)

    g = lambda xp, yp, zp, xd, yd, zd: _grad_coord(seed, xp, yp, zp, xd, yd, zd, dtype)
    xf00 = _lerp(g(x0, y0, z0, xd0, yd0, zd0), g(x1, y0, z0, xd1, yd0, zd0), xs)
    xf10 = _lerp(g(x0, y1, z0, xd0, yd1, zd0), g(x1, y1, z0, xd1, yd1, zd0), xs)
    xf01 = _lerp(g(x0, y0, z1, xd0, yd0, zd1), g(x1, y0, z1, xd1, yd0, zd1), xs)
    xf11 = _lerp(g(x0, y1, z1, xd0, yd1, zd1), g(x1, y1, z1, xd1, yd1, zd1), xs)
    yf0 = _lerp(xf00, xf10, ys)
    yf1 = _lerp(xf01, xf11, ys)
    return _lerp(yf0, yf1, zs) * jnp.asarray(_PERLIN_SCALE, dtype)


def get_noise_3d(x, y, z, seed: int = DEFAULT_SEED, frequency: float = DEFAULT_FREQUENCY):
    """FastNoiseLite get_noise_3d: frequency transform + Perlin (noise.rs:26-29)."""
    f = jnp.asarray(frequency, jnp.asarray(x).dtype)
    return single_perlin3(x * f, y * f, z * f, seed=seed)


def octave_perlin(x, y, z, octaves: int, persistence):
    """fBm normalized by total amplitude (noise.rs:50-63). `octaves` is
    static; `persistence` may be a traced (differentiable) scalar."""
    x = jnp.asarray(x)
    dtype = x.dtype
    total = jnp.zeros_like(x)
    frequency = 1.0
    amplitude = jnp.asarray(1.0, dtype)
    max_value = jnp.asarray(0.0, dtype)
    for _ in range(max(int(octaves), 0)):
        total = total + get_noise_3d(x * frequency, y * frequency,
                                     z * frequency) * amplitude
        max_value = max_value + amplitude
        amplitude = amplitude * persistence
        frequency *= 2.0
    return jnp.where(max_value == 0.0, total,
                     total / jnp.where(max_value == 0.0, 1.0, max_value))
