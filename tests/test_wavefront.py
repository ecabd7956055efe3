"""A/B tests for the compacted Whitted wavefront (integrator.py
`_color_at_compact_scan`) against the exhaustive level scan.

The compact path keeps `wavefront_capacity` live paths per pixel per
depth level, sorted by descending weight; at capacity 2^depth it must
reproduce the exhaustive scan exactly (every path retained, summation
reassociated only within one pixel's path axis), and at the shipped
default the worst-case deviation must stay far below one u8 step.
Reference semantics: scene.rs:128-136,159-178 (recursive Whitted tree
with exact-zero cutoffs).
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _render(yaml, wavefront, cap=4, w=100, h=75):
    from rray_tpu import RenderSettings
    from rray_tpu.io.yaml_loader import load_scene_file
    from rray_tpu import Camera, compile_camera, compile_scene
    from rray_tpu.render.integrator import render

    cam_spec, lights, shapes = load_scene_file(yaml)
    scene = compile_scene(shapes, lights, dtype=jnp.float32)
    cam_h = Camera(w, h, cam_spec["fov"])
    cam_h.transform = cam_spec["transform"]
    cam = compile_camera(cam_h, jnp.float32)
    st = RenderSettings(rows_per_tile=h, max_hits=16, containers_depth=4,
                        wavefront=wavefront, wavefront_capacity=cap)
    return np.asarray(render(scene, cam, settings=st))


GLASS = os.path.join(BASE, "examples", "glass.yaml")
CSG = os.path.join(BASE, "examples", "csg_showcase.yaml")


class TestCompactWavefront:
    def test_full_capacity_matches_scan_exactly(self):
        """cap = 2^depth keeps every path: only the per-pixel summation
        order differs from the scan, so agreement is fp-noise level."""
        a = _render(GLASS, "scan")
        b = _render(GLASS, "compact", cap=32)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_default_capacity_visually_exact(self):
        """Default capacity drops only ~1e-3-weight path tails in the
        <0.1% of pixels holding >4 simultaneous live paths."""
        a = _render(GLASS, "scan")
        b = _render(GLASS, "compact")
        assert np.abs(a - b).max() < 1e-3  # < one u8 step (1/255)

    def test_csg_scene_exact(self):
        """CSG showcase paths die after the first bounce; compaction must
        change nothing."""
        a = _render(CSG, "scan")
        b = _render(CSG, "compact")
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_f64_parity_full_capacity(self):
        """Full-capacity compact vs the exhaustive scan in f64: only the
        per-pixel summation axis is reassociated, so agreement is at
        machine-epsilon level. (The level-unrolled tree itself differs
        from the scan by ~1e-6 on 3/8100 pixels — a pre-existing
        scan-vs-unrolled deviation, not a compaction artifact.)"""
        import jax

        if not jax.config.jax_enable_x64:
            pytest.skip("needs x64")
        from rray_tpu import RenderSettings
        from rray_tpu.io.yaml_loader import load_scene_file
        from rray_tpu import Camera, compile_camera, compile_scene
        from rray_tpu.render.integrator import render

        cam_spec, lights, shapes = load_scene_file(GLASS)
        scene = compile_scene(shapes, lights, dtype=jnp.float64)
        cam_h = Camera(60, 45, cam_spec["fov"])
        cam_h.transform = cam_spec["transform"]
        cam = compile_camera(cam_h, jnp.float64)
        imgs = []
        for wf, cap in (("scan", 4), ("compact", 32)):
            st = RenderSettings(rows_per_tile=45, max_hits=16,
                                containers_depth=4, depth=4, wavefront=wf,
                                wavefront_capacity=cap)
            imgs.append(np.asarray(render(scene, cam, settings=st)))
        np.testing.assert_allclose(imgs[0], imgs[1], atol=1e-12)
