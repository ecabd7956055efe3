"""High-level rendering API (scene_builder_yaml.rs:387-436 equivalents).

`render_scene_from_file/str(path, width, height, png_file, aa)` reproduces
the reference pipeline: build the scene from YAML, size the camera at
width*aa x height*aa (scene_builder_yaml.rs:392), render, box-downsample
by aa, and write the PNG.
"""
from __future__ import annotations

import logging
import time

import jax
import numpy as np

from .config import RenderSettings, default_dtype
from .io.yaml_loader import load_scene_file, load_scene_str
from .render import canvas
from .render.camera import Camera, compile_camera
from .render.integrator import render
from .scene.data import compile_scene

log = logging.getLogger("rray_tpu")

_CACHE_CONFIGURED = False


def enable_compile_cache(path: str = None):
    """Persist XLA compilations across processes (renders recompile per
    raster size; the cache makes repeat CLI invocations start instantly)."""
    global _CACHE_CONFIGURED
    if _CACHE_CONFIGURED:
        return
    import os

    import jax

    path = path or os.environ.get(
        "RRAY_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "rray_tpu", "xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _CACHE_CONFIGURED = True


def _build(camera_spec, lights, shapes, width, height, aa, dtype):
    scene = compile_scene(shapes, lights, dtype=dtype)
    cam_h = Camera(width * aa, height * aa, camera_spec["fov"])
    cam_h.transform = camera_spec["transform"]
    return scene, compile_camera(cam_h, dtype)


def render_scene(camera_spec, lights, shapes, width: int, height: int,
                 aa: int = 1, settings: RenderSettings = None,
                 seed: int = 0, dtype=None) -> np.ndarray:
    """Render a loaded scene -> linear float image [height, width, 3]
    (already AA-downsampled)."""
    enable_compile_cache()
    dtype = dtype or default_dtype()
    settings = settings or RenderSettings()
    scene, cam = _build(camera_spec, lights, shapes, width, height, aa, dtype)

    t0 = time.perf_counter()
    fn = jax.jit(render, static_argnames=("settings", "seed"))
    image = np.asarray(fn(scene, cam, settings=settings, seed=seed))
    dt = time.perf_counter() - t0
    rays = cam.hsize * cam.vsize
    log.info("rendered %dx%d (aa=%d): %.2fs, %.3g primary rays/s",
             width, height, aa, dt, rays / max(dt, 1e-9))
    return canvas.downsample(image, aa)


def render_scene_from_str(contents: str, width: int, height: int,
                          png_file: str, aa: int = 1, base_dir: str = ".",
                          settings: RenderSettings = None, seed: int = 0,
                          dtype=None) -> np.ndarray:
    camera_spec, lights, shapes = load_scene_str(contents, base_dir)
    image = render_scene(camera_spec, lights, shapes, width, height, aa,
                         settings, seed, dtype)
    if png_file:
        canvas.write_png(png_file, image)
    return image


def render_scene_from_file(path: str, width: int, height: int,
                           png_file: str, aa: int = 1,
                           settings: RenderSettings = None, seed: int = 0,
                           dtype=None) -> np.ndarray:
    camera_spec, lights, shapes = load_scene_file(path)
    image = render_scene(camera_spec, lights, shapes, width, height, aa,
                         settings, seed, dtype)
    if png_file:
        canvas.write_png(png_file, image)
    return image
