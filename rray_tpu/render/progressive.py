"""Progressive tile rendering with checkpoint/resume and progress logs.

The reference renders one-shot with an indicatif progress bar
(camera.rs:107-121); long renders can't resume. Here a frame renders as
row-band tiles: each completed band is accumulated into a host canvas
and (optionally) checkpointed with the set of finished bands, so an
interrupted render — or a re-run over a tile range on another host —
picks up where it left off. Throughput (rays/s) and ETA are logged per
band (SURVEY.md §5 observability/checkpoint equivalents).
"""
from __future__ import annotations

import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderSettings
from ..render.camera import CameraData, rays_for_pixels_soa
from ..render import integrator
from ..scene import data as sd
from ..scene import data as sd

log = logging.getLogger("rray_tpu.progressive")


def render_rows(scene: sd.SceneData, cam: CameraData, row_start: int,
                n_rows: int, settings: RenderSettings = RenderSettings(),
                seed: int = 0):
    """Render rows [row_start, row_start + n_rows) -> [n_rows, hsize, 3].

    jit-stable in `n_rows`: re-invoking with a different row_start reuses
    the compiled executable.
    """
    ys, xs = jnp.meshgrid(row_start + jnp.arange(n_rows),
                          jnp.arange(cam.hsize), indexing="ij")
    key = jax.random.fold_in(jax.random.PRNGKey(seed), row_start)
    scene = sd.canonicalize(scene)
    node = integrator._soa_node_fn(scene)
    ro, rd = rays_for_pixels_soa(cam, xs.reshape(-1), ys.reshape(-1))
    colors = node(scene, ro, rd, settings.depth, settings, key).to_array()
    return colors.reshape(n_rows, cam.hsize, 3)


_render_rows_jit = jax.jit(render_rows,
                           static_argnames=("row_start", "n_rows",
                                            "settings", "seed"))


class ProgressiveRender:
    """Accumulates a frame band-by-band with optional checkpointing."""

    def __init__(self, scene, cam, settings: RenderSettings = RenderSettings(),
                 seed: int = 0, band_rows: int = 64,
                 checkpoint_path: str = None):
        self.scene = scene
        self.cam = cam
        self.settings = settings
        self.seed = seed
        self.band_rows = band_rows
        self.checkpoint_path = checkpoint_path
        self.canvas = np.zeros((cam.vsize, cam.hsize, 3), np.float32)
        self.done = np.zeros(self._n_bands(), bool)

    def _n_bands(self) -> int:
        return -(-self.cam.vsize // self.band_rows)

    @classmethod
    def resume(cls, path: str, scene, cam, settings=RenderSettings(),
               seed: int = 0, band_rows: int = 64):
        """Load a checkpoint; bands already rendered are skipped."""
        state = np.load(path)
        r = cls(scene, cam, settings, seed, int(state["band_rows"]), path)
        r.canvas = state["canvas"].copy()
        r.done = state["done"].copy()
        return r

    def checkpoint(self):
        if self.checkpoint_path:
            # Write-then-rename: a crash mid-write (the very failure this
            # checkpoint exists for) must not leave a truncated npz that
            # poisons the next resume.
            # (np.savez appends .npz to names that lack it, so the temp
            # name must keep the suffix for os.replace to find it.)
            tmp = self.checkpoint_path + ".tmp.npz"
            np.savez(tmp, canvas=self.canvas, done=self.done,
                     band_rows=self.band_rows)
            os.replace(tmp, self.checkpoint_path)

    def run(self, bands=None) -> np.ndarray:
        """Render the given band indices (default: all unfinished)."""
        todo = [b for b in (bands if bands is not None
                            else range(self._n_bands())) if not self.done[b]]
        total_rays = len(todo) * self.band_rows * self.cam.hsize
        done_rays = 0
        t_start = time.perf_counter()
        # Failure-injection hook for the elastic-render tests: abort the
        # process after N bands, simulating a device loss mid-frame.
        fail_after = int(os.environ.get("RRAY_FAIL_AFTER_BANDS", "0") or 0)
        bands_this_process = 0
        for b in todo:
            if fail_after and bands_this_process >= fail_after:
                raise RuntimeError(
                    "injected device loss (RRAY_FAIL_AFTER_BANDS)")
            bands_this_process += 1
            row0 = b * self.band_rows
            rows = min(self.band_rows, self.cam.vsize - row0)
            t0 = time.perf_counter()
            band = np.asarray(_render_rows_jit(
                self.scene, self.cam, row_start=row0, n_rows=rows,
                settings=self.settings, seed=self.seed))
            dt = time.perf_counter() - t0
            self.canvas[row0:row0 + rows] = band
            self.done[b] = True
            self.checkpoint()
            done_rays += rows * self.cam.hsize
            elapsed = time.perf_counter() - t_start
            rate = done_rays / max(elapsed, 1e-9)
            eta = (total_rays - done_rays) / max(rate, 1e-9)
            log.info("band %d/%d: %.3fs, %.3g rays/s, ETA %.1fs",
                     b + 1, self._n_bands(), dt, rate, eta)
        return self.canvas
