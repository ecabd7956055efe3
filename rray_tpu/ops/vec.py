"""Structure-of-arrays 3-vectors: the TPU-native ray representation.

TPU vector units operate on (sublane, lane) = (8, 128) tiles; an [R, 3]
array puts the size-3 axis in the lane dimension and wastes 125/128 of
every register, while reductions over that axis defeat fusion. Measured
on a v5e this costs ~3 orders of magnitude on the render loop. So every
hot-path vector is a V3: three independent [R]-shaped component arrays
(a registered pytree), keeping all math purely elementwise over the ray
axis. Matrices stay tiny host-side constants indexed statically.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class V3:
    x: Any
    y: Any
    z: Any

    def __add__(self, o):
        return V3(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o):
        return V3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)

    def __mul__(self, s):
        """Scalar (or [R]-array) scale."""
        return V3(self.x * s, self.y * s, self.z * s)

    __rmul__ = __mul__

    def mul(self, o: "V3") -> "V3":
        """Hadamard product (colors)."""
        return V3(self.x * o.x, self.y * o.y, self.z * o.z)

    def dot(self, o: "V3"):
        return self.x * o.x + self.y * o.y + self.z * o.z

    def cross(self, o: "V3") -> "V3":
        return V3(self.y * o.z - self.z * o.y,
                  self.z * o.x - self.x * o.z,
                  self.x * o.y - self.y * o.x)

    def norm(self):
        return jnp.sqrt(self.dot(self))

    def normalize(self) -> "V3":
        d = self.dot(self)
        # The floor must keep rsqrt's BACKWARD finite in f32 too: at
        # x=1e-30 the partial -x^(-3/2)/2 is ~1e45, which overflows f32
        # to inf, and masked-out lanes (zero vectors whose cotangent is
        # zero) then produce 0*inf = NaN in reverse mode — seen as NaN
        # nmat gradients for triangle rows in normal_at. 1e-18 keeps the
        # partial ~5e26 (finite) and only changes lanes with |v| < 1e-9,
        # which are degenerate/discarded everywhere this is used.
        floor = 1e-30 if d.dtype == jnp.float64 else 1e-18
        inv = jax.lax.rsqrt(jnp.maximum(d, floor))
        return self * inv

    def reflect(self, n: "V3") -> "V3":
        """v - 2 (v.n) n (tuple.rs:114-117)."""
        return self - n * (2.0 * self.dot(n))

    def to_array(self):
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    @property
    def shape(self):
        return jnp.shape(self.x)

    @property
    def dtype(self):
        return jnp.result_type(self.x)


jax.tree_util.register_dataclass(V3, data_fields=["x", "y", "z"],
                                 meta_fields=[])


def from_array(a) -> V3:
    """[..., 3] -> V3 of [...] components."""
    return V3(a[..., 0], a[..., 1], a[..., 2])


def full_like(ref, x, y, z) -> V3:
    return V3(jnp.full_like(ref, x), jnp.full_like(ref, y),
              jnp.full_like(ref, z))


def where(mask, a: V3, b: V3) -> V3:
    return V3(jnp.where(mask, a.x, b.x), jnp.where(mask, a.y, b.y),
              jnp.where(mask, a.z, b.z))


def zeros_like(v: V3) -> V3:
    return V3(jnp.zeros_like(v.x), jnp.zeros_like(v.y), jnp.zeros_like(v.z))


def affine_point(m, p: V3) -> V3:
    """Apply a [3,4] affine (array; rows indexed statically) to points."""
    return V3(m[0, 0] * p.x + m[0, 1] * p.y + m[0, 2] * p.z + m[0, 3],
              m[1, 0] * p.x + m[1, 1] * p.y + m[1, 2] * p.z + m[1, 3],
              m[2, 0] * p.x + m[2, 1] * p.y + m[2, 2] * p.z + m[2, 3])


def affine_vector(m, v: V3) -> V3:
    return V3(m[0, 0] * v.x + m[0, 1] * v.y + m[0, 2] * v.z,
              m[1, 0] * v.x + m[1, 1] * v.y + m[1, 2] * v.z,
              m[2, 0] * v.x + m[2, 1] * v.y + m[2, 2] * v.z)


_SELECT_CHAIN_MAX = 32


def take_rows(table, idx):
    """Row lookup by [R] indices. TPU dynamic gathers serialize per
    element; for small tables a where-select chain over broadcast rows is
    vastly faster, so use it up to _SELECT_CHAIN_MAX rows."""
    n = table.shape[0]
    if 0 < n <= _SELECT_CHAIN_MAX and table.ndim == 1:
        out = jnp.broadcast_to(table[0], idx.shape)
        for i in range(1, n):
            out = jnp.where(idx == i, table[i], out)
        return out
    return jnp.take(table, idx, axis=0)


def matmul3(m, v: V3) -> V3:
    """Apply a [3,3] matrix (normal matrices)."""
    return V3(m[0, 0] * v.x + m[0, 1] * v.y + m[0, 2] * v.z,
              m[1, 0] * v.x + m[1, 1] * v.y + m[1, 2] * v.z,
              m[2, 0] * v.x + m[2, 1] * v.y + m[2, 2] * v.z)
