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


def _render(yaml, wavefront, cap=4, w=100, h=75, pallas="off"):
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
                        wavefront=wavefront, wavefront_capacity=cap,
                        pallas=pallas)
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


class TestWhittedKernel:
    """Fused Pallas compact wavefront (kernels/whitted.py) vs the XLA
    compact path, interpret mode. On-device numerics are pinned by
    check_device_parity.py's whitted probe (Mosaic lowering differs
    from interpret)."""

    def test_applicable_gating(self):
        from rray_tpu import RenderSettings
        from rray_tpu.io.yaml_loader import load_scene_file
        from rray_tpu import compile_scene
        from rray_tpu.kernels import whitted as kwhit

        st = RenderSettings(pallas="interpret")
        _, lights, shapes = load_scene_file(GLASS)
        glass = compile_scene(shapes, lights, dtype=jnp.float32)
        assert kwhit.applicable(glass, st, jnp.float32)
        # CSG + torus + texture scene: fuses since round 5 (analytic
        # CSG members, Mosaic-safe quartic, affine texture completion).
        _, lights, shapes = load_scene_file(CSG)
        csg = compile_scene(shapes, lights, dtype=jnp.float32)
        assert kwhit.applicable(csg, st, jnp.float32)
        # ... but CSG + transparency stays on the sorted XLA path (the
        # n1/n2 walk needs the FILTERED slot list).
        import dataclasses
        refr = dataclasses.replace(csg, has_transparent=True)
        assert not kwhit.applicable(refr, st, jnp.float32)
        # pallas off: never applicable.
        assert not kwhit.applicable(glass, RenderSettings(pallas="off"),
                                    jnp.float32)

    def test_glass_matches_xla_compact(self):
        a = _render(GLASS, "compact")
        b = _render(GLASS, "compact", pallas="interpret")
        np.testing.assert_allclose(a, b, atol=2e-6)

    def test_mesh_scene_gating_and_gradients(self):
        """Depth-0 point-light mesh scenes fuse into the whitted kernel
        (scalar-broadcast MT over the SMEM triangle table); the custom
        VJP recomputes through the XLA node, so mesh gradients must
        match the pure-XLA gradients. Reflective/transparent mesh
        scenes and >MESH_MAX_TRIS meshes must NOT take the kernel."""
        import dataclasses

        import jax

        from rray_tpu import (Camera, Material, Pattern, PointLight,
                              RenderSettings, Shape, compile_camera,
                              compile_scene)
        from rray_tpu import mathutils as mu
        from rray_tpu.io.obj_loader import load_obj_str
        from rray_tpu.kernels import whitted as kwhit
        from rray_tpu.render.integrator import render

        tet = load_obj_str(
            "v 0 1.6 -0.2\nv 0.9 0.3 -0.7\nv -0.9 0.3 -0.7\nv 0 0.3 1.0\n"
            "f 1 2 3\nf 1 3 4\nf 1 4 2\nf 2 4 3\n",
            Material(pattern=Pattern.solid([0.7, 0.5, 0.2])))
        floor = Shape("plane", material=Material(
            pattern=Pattern("checker", a=Pattern.solid([1.0, 1.0, 1.0]),
                            b=Pattern.solid([0.2, 0.2, 0.2])),
            specular=0.0))
        light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
        scene = compile_scene([floor, tet], [light], dtype=jnp.float32)
        cam_h = Camera(32, 24, np.pi / 3)
        cam_h.transform = mu.view_transform([0, 1.5, -5], [0, 1, 0],
                                            [0, 1, 0])
        cam = compile_camera(cam_h, jnp.float32)
        st_i = RenderSettings(rows_per_tile=24, pallas="interpret")
        st_o = RenderSettings(rows_per_tile=24, pallas="off")
        assert kwhit.applicable(scene, st_i, jnp.float32)

        def fl(g):
            return [l for l in jax.tree_util.tree_leaves(g)
                    if hasattr(l, "dtype")
                    and jnp.issubdtype(l.dtype, jnp.floating) and l.size]

        def loss(settings):
            return lambda s: (render(s, cam, settings=settings) ** 2).sum()

        gk = jax.grad(loss(st_i), allow_int=True)(scene)
        gx = jax.grad(loss(st_o), allow_int=True)(scene)
        assert all(bool(jnp.isfinite(l).all()) for l in fl(gk))
        assert any(float(jnp.abs(l).sum()) > 0 for l in fl(gk))
        for lk, lx in zip(fl(gk), fl(gx)):
            np.testing.assert_allclose(np.asarray(lk), np.asarray(lx),
                                       atol=2e-3)

        # Gating: transparency pushes mesh scenes off the kernel (the
        # n1/n2 folds would need every mesh slot); reflective meshes
        # fuse since round 5.
        refl = dataclasses.replace(scene, has_reflective=True)
        assert kwhit.applicable(refl, st_i, jnp.float32)
        refr = dataclasses.replace(scene, has_transparent=True)
        assert not kwhit.applicable(refr, st_i, jnp.float32)

    def test_area_scene_matches_xla(self):
        """area_light.yaml through the fused kernel (fast path, depth
        0, 25-sample soft shadows): the jitter draws are recomputed
        in-register from the same point-keyed hash (ops/jitter.py), so
        the A/B is exact up to the kernel's multiply-by-1/n fraction
        (measured 0.0 at this size)."""
        area = os.path.join(BASE, "examples", "area_light.yaml")
        a = _render(area, "compact")
        b = _render(area, "compact", pallas="interpret")
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_capacity_plumb(self):
        """wavefront_capacity reaches the kernel's W; cap=8 vs the
        exhaustive scan must agree like the XLA full-capacity test
        (depth 3 -> 2^3 = 8 keeps every path). Depth 3 rather than the
        XLA test's 5: the W=8 interpret-mode kernel is already a huge
        unrolled graph (odd-even sort over 16 child rows per level),
        and cap > 2^depth exercises no additional plumbing."""
        from rray_tpu import RenderSettings
        from rray_tpu.io.yaml_loader import load_scene_file
        from rray_tpu import Camera, compile_camera, compile_scene
        from rray_tpu.render.integrator import render

        cam_spec, lights, shapes = load_scene_file(GLASS)
        scene = compile_scene(shapes, lights, dtype=jnp.float32)
        cam_h = Camera(48, 36, cam_spec["fov"])
        cam_h.transform = cam_spec["transform"]
        cam = compile_camera(cam_h, jnp.float32)
        a = np.asarray(render(scene, cam, settings=RenderSettings(
            rows_per_tile=36, max_hits=16, containers_depth=4, depth=3,
            wavefront="scan")))
        b = np.asarray(render(scene, cam, settings=RenderSettings(
            rows_per_tile=36, max_hits=16, containers_depth=4, depth=3,
            wavefront_capacity=8, pallas="interpret")))
        np.testing.assert_allclose(a, b, atol=2e-6)

    def test_gradients_match_xla_path(self):
        """The kernel's custom VJP recomputes through the XLA compact
        wavefront, so gradients must match the pure-XLA gradients up to
        recompilation noise: the recompute compiles in a different graph
        context, and FMA contraction flips f32 boundary decisions
        (shadow grazing hits, closest-hit ties) on a few rays — the same
        class of deviation CLAUDE.md documents for compiled-vs-eager.
        Measured: max rel 0.8% on ~12% of cls_table entries, max abs
        1.6e-5."""
        import jax
        from rray_tpu import RenderSettings
        from rray_tpu.io.yaml_loader import load_scene_file
        from rray_tpu import Camera, compile_camera, compile_scene
        from rray_tpu.parallel import train as ptrain

        cam_spec, lights, shapes = load_scene_file(GLASS)
        scene = compile_scene(shapes, lights, dtype=jnp.float32)
        cam_h = Camera(32, 24, cam_spec["fov"])
        cam_h.transform = cam_spec["transform"]
        cam = compile_camera(cam_h, jnp.float32)
        target = jnp.zeros((24, 32, 3), jnp.float32)
        grads = {}
        for mode in ("off", "interpret"):
            st = RenderSettings(rows_per_tile=24, max_hits=16,
                                containers_depth=4, pallas=mode)
            params, rest = ptrain.partition_scene(scene)
            _, g = jax.value_and_grad(ptrain.render_loss)(
                params, rest, cam, target, st, jax.random.PRNGKey(0))
            grads[mode] = [np.asarray(x) for x in g if x is not None]
        assert len(grads["off"]) == len(grads["interpret"])
        for a, b in zip(grads["off"], grads["interpret"]):
            assert np.isfinite(b).all()
            np.testing.assert_allclose(a, b, rtol=0.05, atol=1e-4)

    def test_cylinder_cone_shadows_match_xla(self):
        """Bounded closed cylinder + cone shadows through the fused
        kernel: _occludes reads the analytic 16-col layout (ymin/ymax/
        closed at 12-14), which the whitted 32-col prim rows must remap
        to 21-23 — the unmapped reader fed normal-matrix entries as cap
        bounds and dropped the shadows (round-4 advisor high finding;
        measured 0.51 linear-color diff before the fix)."""
        from rray_tpu import (AreaLight, Camera, Material, Pattern,
                              RenderSettings, Shape, compile_camera,
                              compile_scene)
        from rray_tpu import mathutils as mu
        from rray_tpu.kernels import whitted as kwhit
        from rray_tpu.render.integrator import render

        floor = Shape("plane", material=Material(
            pattern=Pattern.solid([1.0, 0.9, 0.9]), specular=0.0))
        cyl = Shape("cylinder", transform=mu.translate(-1.0, 0.0, 0.5),
                    minimum=0.0, maximum=1.5, closed=True,
                    material=Material(pattern=Pattern.solid(
                        [0.2, 0.7, 0.3])))
        cone = Shape("cone", transform=mu.translate(1.2, 1.0, 0.5),
                     minimum=-1.0, maximum=0.0, closed=True,
                     material=Material(pattern=Pattern.solid(
                         [0.7, 0.3, 0.2])))
        light = AreaLight(np.array([-6.0, 8.0, -4.0]),
                          np.array([2.0, 0.0, 0.0]),
                          np.array([0.0, 2.0, 0.0]), np.ones(3), level=3)
        scene = compile_scene([floor, cyl, cone], [light],
                              dtype=jnp.float32)
        cam_h = Camera(64, 48, np.pi / 3)
        cam_h.transform = mu.view_transform([0, 2.5, -6], [0, 1, 0],
                                            [0, 1, 0])
        cam = compile_camera(cam_h, jnp.float32)
        st_i = RenderSettings(rows_per_tile=48, pallas="interpret")
        assert kwhit.applicable(scene, st_i, jnp.float32)
        a = np.asarray(render(scene, cam,
                              settings=RenderSettings(rows_per_tile=48,
                                                      pallas="off")))
        b = np.asarray(render(scene, cam, settings=st_i))
        # The scene must actually shadow (else the A/B proves nothing).
        lit = a.max(axis=2)
        assert lit.min() < 0.55 * lit.max()
        np.testing.assert_allclose(a, b, atol=2e-6)

    def test_csg_showcase_matches_xla(self):
        """The BASELINE config-5 scene (CSG difference + torus quartic +
        image texture + noise/stripe/gradient patterns) through the
        fused kernel. The kernel's quartic uses Mosaic-safe
        transcendentals (Newton cos(acos/3), exp/log cbrt) and the uv
        atan2 is a polynomial, so torus-silhouette/texel-boundary
        pixels may legitimately flip — bound the flip count, pin
        everything else tight."""
        a = _render(CSG, "compact", w=192, h=108)
        b = _render(CSG, "compact", w=192, h=108, pallas="interpret")
        d = np.abs(a - b).max(axis=2)
        assert float((d > 1e-3).mean()) < 2e-3, float((d > 1e-3).mean())
        assert np.median(np.abs(a - b)) < 1e-6

    def test_torus_glass_matches_xla(self):
        """Torus + transparency (no CSG): the quartic slots feed the
        in-kernel n1/n2 crossing folds."""
        from rray_tpu import (Camera, Material, Pattern, PointLight,
                              RenderSettings, Shape, compile_camera,
                              compile_scene)
        from rray_tpu import mathutils as mu
        from rray_tpu.kernels import whitted as kwhit
        from rray_tpu.render.integrator import render

        floor = Shape("plane", material=Material(
            pattern=Pattern.solid([0.9, 0.9, 0.9]), specular=0.0))
        torus = Shape("torus", minor_radius=0.35,
                      transform=mu.compose([mu.translate(0, 0.9, 0),
                                            mu.rotate_x(np.pi / 2)]),
                      material=Material(
                          pattern=Pattern.solid([0.05, 0.05, 0.05]),
                          transparency=0.8, refractive_index=1.3,
                          diffuse=0.2))
        light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
        scene = compile_scene([floor, torus], [light], dtype=jnp.float32)
        cam_h = Camera(64, 48, np.pi / 3)
        cam_h.transform = mu.view_transform([0, 1.5, -5], [0, 1, 0],
                                            [0, 1, 0])
        cam = compile_camera(cam_h, jnp.float32)
        st_i = RenderSettings(rows_per_tile=48, max_hits=16,
                              containers_depth=4, pallas="interpret")
        assert kwhit.applicable(scene, st_i, jnp.float32)
        a = np.asarray(render(scene, cam, settings=RenderSettings(
            rows_per_tile=48, max_hits=16, containers_depth=4,
            pallas="off")))
        b = np.asarray(render(scene, cam, settings=st_i))
        d = np.abs(a - b).max(axis=2)
        assert float((d > 1e-3).mean()) < 5e-3, float((d > 1e-3).mean())
        assert np.median(np.abs(a - b)) < 1e-6

    def test_reflective_and_area_mesh_match_xla(self):
        """Round-5 mesh-fusion widening: a REFLECTIVE floor under the
        mesh (width-1 bounce chain — the mesh fold replicates per
        level) and an AREA light over the mesh (the chunk-gated mesh
        any-hit runs per shadow sample) must both ride the kernel and
        match the XLA paths."""
        from rray_tpu import (AreaLight, Camera, Material, Pattern,
                              PointLight, RenderSettings, Shape,
                              compile_camera, compile_scene)
        from rray_tpu import mathutils as mu
        from rray_tpu.io.obj_loader import load_obj_str
        from rray_tpu.kernels import whitted as kwhit
        from rray_tpu.render.integrator import render

        def tet():
            return load_obj_str(
                "v 0 1.6 -0.2\nv 0.9 0.3 -0.7\nv -0.9 0.3 -0.7\n"
                "v 0 0.3 1.0\nf 1 2 3\nf 1 3 4\nf 1 4 2\nf 2 4 3\n",
                Material(pattern=Pattern.solid([0.7, 0.5, 0.2])))

        cam_h = Camera(48, 36, np.pi / 3)
        cam_h.transform = mu.view_transform([0, 1.5, -5], [0, 1, 0],
                                            [0, 1, 0])
        cam = compile_camera(cam_h, jnp.float32)
        st_i = RenderSettings(rows_per_tile=36, pallas="interpret")
        st_o = RenderSettings(rows_per_tile=36, pallas="off")

        refl_floor = Shape("plane", material=Material(
            pattern=Pattern.solid([0.9, 0.9, 1.0]), specular=0.0,
            reflective=0.4))
        point = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
        scene = compile_scene([refl_floor, tet()], [point],
                              dtype=jnp.float32)
        assert kwhit.applicable(scene, st_i, jnp.float32)
        a = np.asarray(render(scene, cam, settings=st_o))
        b = np.asarray(render(scene, cam, settings=st_i))
        np.testing.assert_allclose(a, b, atol=2e-6)

        floor = Shape("plane", material=Material(
            pattern=Pattern.solid([0.9, 0.9, 1.0]), specular=0.0))
        area = AreaLight(np.array([-6.0, 8.0, -4.0]),
                         np.array([2.0, 0.0, 0.0]),
                         np.array([0.0, 2.0, 0.0]), np.ones(3), level=3)
        scene = compile_scene([floor, tet()], [area], dtype=jnp.float32)
        assert kwhit.applicable(scene, st_i, jnp.float32)
        a = np.asarray(render(scene, cam, settings=st_o))
        b = np.asarray(render(scene, cam, settings=st_i))
        np.testing.assert_allclose(a, b, atol=2e-6)

    def test_csg_cutout_does_not_shadow(self):
        """A difference CSG's removed region must not occlude shadow
        rays (is_shadowed sees the FILTERED intersections —
        scene.rs:234-245): kernel vs XLA must agree, and the scene must
        show lit floor under the cut-out."""
        from rray_tpu import (AreaLight, Camera, Material, Pattern,
                              RenderSettings, Shape, compile_camera,
                              compile_scene)
        from rray_tpu import mathutils as mu
        from rray_tpu.kernels import whitted as kwhit
        from rray_tpu.render.integrator import render

        floor = Shape("plane", material=Material(
            pattern=Pattern.solid([1.0, 1.0, 1.0]), specular=0.0))
        # A hollow shell directly under the light: the sphere cut-out
        # removes the cube's interior, so rays through the hole pass.
        cube = Shape("cube", transform=mu.compose(
            [mu.translate(0, 2.5, 0), mu.scale(1.0, 0.2, 1.0)]),
            material=Material(pattern=Pattern.solid([0.8, 0.3, 0.3])))
        hole = Shape("sphere", transform=mu.compose(
            [mu.translate(0, 2.5, 0), mu.scale(0.6, 0.6, 0.6)]),
            material=Material(pattern=Pattern.solid([0.2, 0.6, 0.3])))
        csg = Shape("csg", operation="difference", left=cube, right=hole)
        light = AreaLight(np.array([-0.5, 8.0, -0.5]),
                          np.array([1.0, 0.0, 0.0]),
                          np.array([0.0, 0.0, 1.0]), np.ones(3), level=2)
        scene = compile_scene([floor, csg], [light], dtype=jnp.float32)
        cam_h = Camera(48, 36, np.pi / 3)
        cam_h.transform = mu.view_transform([0, 4.0, -6], [0, 1, 0],
                                            [0, 1, 0])
        cam = compile_camera(cam_h, jnp.float32)
        st_i = RenderSettings(rows_per_tile=36, pallas="interpret")
        assert kwhit.applicable(scene, st_i, jnp.float32)
        a = np.asarray(render(scene, cam, settings=RenderSettings(
            rows_per_tile=36, pallas="off")))
        b = np.asarray(render(scene, cam, settings=st_i))
        np.testing.assert_allclose(a, b, atol=2e-6)

    def test_train_then_render_path_invariant(self):
        """One optimizer step on kernel-path gradients must leave a
        scene that renders identically under the kernel and pure-XLA
        paths — i.e. no gradient mass may land on tensors only one
        path consumes (the round-4 red test's failure mode: flat
        normals duplicated across tri_nflat and tri_n1..n3)."""
        import jax

        from rray_tpu import (Camera, Material, Pattern, PointLight,
                              RenderSettings, Shape, compile_camera,
                              compile_scene)
        from rray_tpu import mathutils as mu
        from rray_tpu.io.obj_loader import load_obj_str
        from rray_tpu.render.integrator import render

        tet = load_obj_str(
            "v 0 1.6 -0.2\nv 0.9 0.3 -0.7\nv -0.9 0.3 -0.7\nv 0 0.3 1.0\n"
            "f 1 2 3\nf 1 3 4\nf 1 4 2\nf 2 4 3\n",
            Material(pattern=Pattern.solid([0.7, 0.5, 0.2])))
        floor = Shape("plane", material=Material(
            pattern=Pattern.solid([0.9, 0.9, 1.0]), specular=0.0))
        light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
        scene = compile_scene([floor, tet], [light], dtype=jnp.float32)
        cam_h = Camera(32, 24, np.pi / 3)
        cam_h.transform = mu.view_transform([0, 1.5, -5], [0, 1, 0],
                                            [0, 1, 0])
        cam = compile_camera(cam_h, jnp.float32)
        st_i = RenderSettings(rows_per_tile=24, pallas="interpret")
        st_o = RenderSettings(rows_per_tile=24, pallas="off")

        g = jax.grad(lambda s: (render(s, cam, settings=st_i) ** 2).sum(),
                     allow_int=True)(scene)
        lr = 0.05
        trained = jax.tree_util.tree_map(
            lambda p, gg: p - lr * gg
            if (hasattr(p, "dtype")
                and jnp.issubdtype(p.dtype, jnp.floating)) else p,
            scene, g)
        a = np.asarray(render(trained, cam, settings=st_o))
        b = np.asarray(render(trained, cam, settings=st_i))
        assert np.abs(a - np.asarray(render(scene, cam, settings=st_o))
                      ).max() > 1e-4  # the step actually moved the frame
        np.testing.assert_allclose(a, b, atol=2e-6)
