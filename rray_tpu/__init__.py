"""rray_tpu: a TPU-native differentiable Whitted raytracer in JAX.

A from-scratch reimplementation of the capability set of davelpz/rray
(a Rust CPU raytracer following "The Ray Tracer Challenge"), redesigned
for TPUs: struct-of-arrays scene tensors, masked vectorized intersection,
a statically-unrolled wavefront bounce tree, seeded sampling, pixel-tile
sharding across device meshes, and end-to-end differentiability.
"""
from .config import EPSILON, RenderSettings, default_dtype
from .scene.data import (AreaLight, Material, Pattern, PointLight, Shape,
                         compile_scene, glass_material)
from .render.camera import Camera, compile_camera
from .render.integrator import color_at, render

__all__ = [
    "EPSILON", "RenderSettings", "default_dtype",
    "AreaLight", "Material", "Pattern", "PointLight", "Shape",
    "compile_scene", "glass_material",
    "Camera", "compile_camera", "color_at", "render",
    "render_scene_from_file", "render_scene_from_str",
]


def __getattr__(name):
    # Lazy: the api module pulls in IO deps (PIL/yaml) not needed for
    # pure compute use.
    if name in ("render_scene_from_file", "render_scene_from_str"):
        from . import api

        return getattr(api, name)
    raise AttributeError(name)
