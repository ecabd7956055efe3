"""High-level rendering API (scene_builder_yaml.rs:387-436 equivalents).

`render_scene_from_file/str(path, width, height, png_file, aa)` reproduces
the reference pipeline: build the scene from YAML, size the camera at
width*aa x height*aa (scene_builder_yaml.rs:392), render, box-downsample
by aa, and write the PNG.
"""
from __future__ import annotations

import logging
import os
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


def render_scene_progressive(path: str, width: int, height: int,
                             png_file: str, aa: int = 1, seed: int = 0,
                             band_rows: int = 64,
                             checkpoint_path: str = None,
                             settings: RenderSettings = None,
                             dtype=None) -> np.ndarray:
    """Band-by-band render with checkpoint/resume (CLI --checkpoint).

    A pre-existing checkpoint (same scene/camera) is resumed: only
    unfinished bands render. The PNG is written once the frame
    completes."""
    from .render.progressive import ProgressiveRender

    enable_compile_cache()
    dtype = dtype or default_dtype()
    settings = settings or RenderSettings()
    camera_spec, lights, shapes = load_scene_file(path)
    scene, cam = _build(camera_spec, lights, shapes, width, height, aa,
                        dtype)
    prog = None
    if checkpoint_path and os.path.exists(checkpoint_path):
        try:
            prog = ProgressiveRender.resume(checkpoint_path, scene, cam,
                                            settings, seed, band_rows)
        except Exception as e:  # truncated/corrupt checkpoint: start over
            log.warning("checkpoint %s unreadable (%s); starting fresh",
                        checkpoint_path, e)
    if prog is None:
        prog = ProgressiveRender(scene, cam, settings, seed, band_rows,
                                 checkpoint_path)
    image = canvas.downsample(prog.run(), aa)
    if png_file:
        canvas.write_png(png_file, image)
    return image


def render_resilient(path: str, width: int, height: int, png_file: str,
                     aa: int = 1, seed: int = 0, band_rows: int = 64,
                     checkpoint_path: str = None, attempts: int = 4,
                     wait_s: float = 0.0, platform: str = None) -> int:
    """Elastic full-frame render: checkpointed subprocesses + restart.

    The failure domain on a tunneled TPU is the whole backend — a
    crashed worker cannot be re-initialized in-process — so the elastic
    unit is a child interpreter running the checkpointing CLI. Each
    retry gets a fresh backend and resumes from the band checkpoint, so
    completed work is never re-rendered (the render-path analog of
    checkpoint/restart elastic training). Returns the subprocess's final
    return code (0 = frame complete, PNG written)."""
    import subprocess
    import sys
    import tempfile
    import time as _time

    if checkpoint_path is None:
        checkpoint_path = os.path.join(
            tempfile.mkdtemp(prefix="rray_ckpt_"), "frame.npz")
    cmd = [sys.executable, "-m", "rray_tpu.cli", "-s", path,
           "-W", str(width), "-H", str(height), "-o", png_file,
           "-a", str(aa), "--seed", str(seed),
           "--checkpoint", checkpoint_path, "--band-rows", str(band_rows)]
    if platform:
        # Pin the children's backend (tests use "cpu" so the elastic
        # machinery is exercised without waiting on a remote TPU worker
        # that may be mid-recovery — its outages are exactly what this
        # path exists to survive in production).
        cmd += ["--platform", platform]
    last_done = -1
    rc = 1
    for attempt in range(attempts):
        rc = subprocess.call(cmd)
        if rc == 0:
            return 0
        done = -1
        if os.path.exists(checkpoint_path):
            try:
                done = int(np.load(checkpoint_path)["done"].sum())
            except Exception:  # corrupt checkpoint: child will restart
                done = -1
        log.warning("render attempt %d failed (rc=%d, %d bands done)",
                    attempt + 1, rc, max(done, 0))
        if done <= last_done and attempt:
            # No forward progress two attempts running: give up early.
            return rc
        last_done = done
        if wait_s:
            _time.sleep(wait_s)
    return rc
