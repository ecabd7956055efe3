"""Point-keyed stratified jitter for area-light sampling.

The reference jitters each shadow sample with thread_rng — run-to-run
NONdeterministic (light.rs:47-65); this repo always used a seeded PRNG
instead (documented deviation). Round 4 replaces the shaped rbg draws
with a counter-based hash of the SHADOW ORIGIN's float bits:

    draw(s, dim) = fmix32(base ^ mix(s, dim)),
    base = fmix32(bits(x) * C1 ^ fmix32(bits(y) * C2 ^ fmix32(bits(z)
           * C3 ^ seed)))

(murmur3's finalizer as the mixer). Why point-keyed:

* a draw is a pure function of (seed, point) — the SAME value no matter
  how the frame is tiled, swizzled, or sharded, so sharded == single
  holds exactly for area scenes and the old "swizzling permutes which
  jitter a pixel gets" caveat disappears;
* it is ~12 integer vector ops per draw, computable identically in XLA
  and INSIDE a Pallas kernel (pure jnp int32 ops — no pltpu PRNG, which
  has no interpret-mode lowering), so the fused kernels never
  materialize a [2n, R] draw array through HBM (864 MB/frame on the
  area BASELINE config);
* integer ops are exact, so the XLA path and every kernel consume
  bit-identical draws.

Gradients: callers stop_gradient the point (bitcast has no JVP, and
jitter is sampling noise, not signal).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# murmur3 constants as wrapped int32.
_C1 = np.int32(np.uint32(0xCC9E2D51).view(np.int32))
_C2 = np.int32(np.uint32(0x1B873593).view(np.int32))
_C3 = np.int32(np.uint32(0x85EBCA6B).view(np.int32))
_F1 = np.int32(np.uint32(0x85EBCA6B).view(np.int32))
_F2 = np.int32(np.uint32(0xC2B2AE35).view(np.int32))
_GOLD = np.int32(np.uint32(0x9E3779B9).view(np.int32))


def _shr(h, k):
    return jax.lax.shift_right_logical(h, jnp.int32(k))


def fmix32(h):
    """murmur3 finalizer: full-avalanche 32-bit mix (wrapping int32)."""
    h = h ^ _shr(h, 16)
    h = h * _F1
    h = h ^ _shr(h, 13)
    h = h * _F2
    h = h ^ _shr(h, 16)
    return h


def seed_from_key(key):
    """Fold a jax PRNG key into one int32 seed (traced)."""
    d = jax.random.key_data(key)
    s = d.reshape(-1).astype(jnp.uint32)
    return (s[0] ^ s[-1]).astype(jnp.int32)


def point_base(seed, x, y, z):
    """Per-point hash base from the f32 bit patterns of (x, y, z)."""
    f32 = jnp.float32
    bx = jax.lax.bitcast_convert_type(x.astype(f32), jnp.int32)
    by = jax.lax.bitcast_convert_type(y.astype(f32), jnp.int32)
    bz = jax.lax.bitcast_convert_type(z.astype(f32), jnp.int32)
    return fmix32(bx * _C1 ^ fmix32(by * _C2 ^ fmix32(bz * _C3 ^ seed)))


def draw_unit(base, counter: int):
    """counter-th uniform in [0, 1) for each lane of `base` (f32:
    24-bit mantissa-exact)."""
    v = (counter * 0x9E3779B9) & 0xFFFFFFFF  # wrap in Python ints
    h = fmix32(base ^ jnp.int32(v - 0x100000000 if v >= 0x80000000 else v))
    return _shr(h, 8).astype(jnp.float32) * jnp.float32(2.0 ** -24)


def point_jitter(seed, x, y, z, n: int, dtype=jnp.float32):
    """[2, n, R] stratified-jitter draws keyed by (seed, point bits).

    Matches the consumption order of the area-light sample loops: sample
    s reads (out[0, s], out[1, s])."""
    base = point_base(seed, x, y, z)
    r0 = jnp.stack([draw_unit(base, 2 * s) for s in range(n)])
    r1 = jnp.stack([draw_unit(base, 2 * s + 1) for s in range(n)])
    return jnp.stack([r0, r1]).astype(dtype)
