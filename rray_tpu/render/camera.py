"""Pinhole camera (camera.rs:29-93): ray generation for the whole raster.

The camera is host-side data (its inverse view transform folds at build
time); ray generation is a vectorized version of ray_for_pixel — pixel
centers on the z=-1 canvas plane, +x to the left.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .. import mathutils as mu


@dataclasses.dataclass
class Camera:
    hsize: int
    vsize: int
    field_of_view: float
    transform: np.ndarray = dataclasses.field(default_factory=mu.identity)

    @property
    def _derived(self):
        half_view = np.tan(self.field_of_view / 2.0)
        aspect = self.hsize / self.vsize
        if aspect >= 1.0:
            half_width, half_height = half_view, half_view / aspect
        else:
            half_width, half_height = half_view * aspect, half_view
        pixel_size = half_width * 2.0 / self.hsize
        return half_width, half_height, pixel_size

    @property
    def pixel_size(self):
        return self._derived[2]

    @property
    def half_width(self):
        return self._derived[0]

    @property
    def half_height(self):
        return self._derived[1]


@dataclasses.dataclass
class CameraData:
    """Device-side camera parameters (differentiable leaves)."""

    inv: Any          # [3,4] inverse view transform (affine)
    half_width: Any   # scalar
    half_height: Any  # scalar
    pixel_size: Any   # scalar
    hsize: int
    vsize: int


jax.tree_util.register_dataclass(
    CameraData,
    data_fields=["inv", "half_width", "half_height", "pixel_size"],
    meta_fields=["hsize", "vsize"])


def compile_camera(cam: Camera, dtype) -> CameraData:
    hw, hh, ps = cam._derived
    inv = mu.affine(mu.inverse(cam.transform))
    return CameraData(inv=jnp.asarray(inv, dtype),
                      half_width=jnp.asarray(hw, dtype),
                      half_height=jnp.asarray(hh, dtype),
                      pixel_size=jnp.asarray(ps, dtype),
                      hsize=cam.hsize, vsize=cam.vsize)


def rays_for_pixels(cam: CameraData, px, py):
    """ray_for_pixel (camera.rs:75-93) for integer pixel arrays [R]."""
    dtype = cam.inv.dtype
    xoff = (px.astype(dtype) + 0.5) * cam.pixel_size
    yoff = (py.astype(dtype) + 0.5) * cam.pixel_size
    wx = cam.half_width - xoff
    wy = cam.half_height - yoff
    canvas = jnp.stack([wx, wy, -jnp.ones_like(wx)], -1)
    lin = cam.inv[:, :3]
    trans = cam.inv[:, 3]
    pixel = canvas @ lin.T + trans
    origin = jnp.broadcast_to(trans, pixel.shape)
    direction = pixel - origin
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    return origin, direction


def all_rays(cam: CameraData):
    """Rays for the full raster in row-major order (camera.rs:134-136)."""
    ys, xs = jnp.meshgrid(jnp.arange(cam.vsize), jnp.arange(cam.hsize),
                          indexing="ij")
    return rays_for_pixels(cam, xs.reshape(-1), ys.reshape(-1))


def rays_for_pixels_soa(cam: CameraData, px, py):
    """ray_for_pixel (camera.rs:75-93) in component-array (SoA) form."""
    from ..ops.vec import V3

    dtype = cam.inv.dtype
    xoff = (px.astype(dtype) + 0.5) * cam.pixel_size
    yoff = (py.astype(dtype) + 0.5) * cam.pixel_size
    wx = cam.half_width - xoff
    wy = cam.half_height - yoff
    lin = cam.inv[:, :3]
    tr = cam.inv[:, 3]
    pixel = V3(lin[0, 0] * wx + lin[0, 1] * wy - lin[0, 2] + tr[0],
               lin[1, 0] * wx + lin[1, 1] * wy - lin[1, 2] + tr[1],
               lin[2, 0] * wx + lin[2, 1] * wy - lin[2, 2] + tr[2])
    origin = V3(jnp.broadcast_to(tr[0], wx.shape),
                jnp.broadcast_to(tr[1], wx.shape),
                jnp.broadcast_to(tr[2], wx.shape))
    direction = (pixel - origin).normalize()
    return origin, direction


def all_rays_soa(cam: CameraData):
    """SoA rays for the full raster in row-major order."""
    ys, xs = jnp.meshgrid(jnp.arange(cam.vsize), jnp.arange(cam.hsize),
                          indexing="ij")
    return rays_for_pixels_soa(cam, xs.reshape(-1), ys.reshape(-1))
