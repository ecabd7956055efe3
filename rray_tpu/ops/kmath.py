"""Mosaic-safe scalar math for Pallas TPU kernels.

Mosaic's Pallas lowering has no atan2/acos/asin (tested round 5:
`Unimplemented primitive ... atan2/acos`), but the uv_mapping formulas
(sphere.rs:126-132, cylinder.rs:181-196, cone.rs:232-255,
torus.rs:150-161) need them for in-kernel texture coordinates. These are
polynomial forms accurate to ~2e-7 rad — far below a texel at any
realistic texture size (one texel spans 2*pi/W >= 1e-3 rad of u).
"""
from __future__ import annotations

import jax.numpy as jnp

_HALF_PI = 1.5707963267948966
_PI = 3.141592653589793


def atan2(y, x):
    """Four-quadrant arctangent via an odd minimax polynomial on [0, 1].

    Matches jnp.arctan2 conventions on the axes: atan2(0, x>0) = 0,
    atan2(0, x<0) = pi, atan2(y>0, 0) = pi/2, atan2(0, 0) = 0."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    a = jnp.minimum(ax, ay) / jnp.maximum(mx, 1e-30)
    s = a * a
    r = ((((-0.0117212 * s + 0.05265332) * s - 0.11643287) * s
          + 0.19354346) * s - 0.33262347) * s + 0.99997726
    r = r * a
    r = jnp.where(ay > ax, _HALF_PI - r, r)
    r = jnp.where(x < 0.0, _PI - r, r)
    return jnp.where(y < 0.0, -r, r)


def arccos(c):
    """arccos via atan2(sqrt(1 - c^2), c), c clipped to [-1, 1]."""
    c = jnp.clip(c, -1.0, 1.0)
    return atan2(jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0)), c)
