"""Differentiable-rendering checks (BASELINE.md gradient targets): autodiff
pixel gradients vs central finite differences, and an end-to-end inverse
rendering step that reduces the loss."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rray_tpu import (Camera, Material, Pattern, PointLight, RenderSettings,
                      Shape, compile_camera, compile_scene)
from rray_tpu import mathutils as mu
from rray_tpu.parallel import train as ptrain
from rray_tpu.render.integrator import render

SET = RenderSettings(rows_per_tile=16, max_hits=4, containers_depth=2)


def small_setup():
    floor = Shape("plane", material=Material(
        pattern=Pattern.solid([0.9, 0.9, 0.9]), specular=0.0))
    ball = Shape("sphere", transform=mu.translate(0, 1, 0),
                 material=Material(pattern=Pattern.solid([0.7, 0.2, 0.2]),
                                   diffuse=0.7, specular=0.3))
    light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
    scene = compile_scene([floor, ball], [light], dtype=jnp.float64)
    cam_h = Camera(16, 12, np.pi / 3)
    cam_h.transform = mu.view_transform([0, 1.5, -5], [0, 1, 0], [0, 1, 0])
    cam = compile_camera(cam_h, jnp.float64)
    return scene, cam


def loss_of(scene, cam):
    img = render(scene, cam, settings=SET)
    return jnp.mean(img ** 2)


def scene_grad(scene, cam):
    """Gradient of the loss w.r.t. every float leaf, repacked as SceneData."""
    params, rest = ptrain.partition_scene(scene)
    g = jax.grad(
        lambda p: loss_of(ptrain.merge_scene(p, rest), cam))(params)
    return ptrain.merge_scene(g, rest)


class TestFiniteDifference:
    def check_leaf(self, get, set_, eps=1e-6):
        scene, cam = small_setup()
        grad_scene = scene_grad(scene, cam)
        auto = float(get(grad_scene))
        lo = loss_of(set_(scene, -eps), cam)
        hi = loss_of(set_(scene, +eps), cam)
        fd = float((hi - lo) / (2 * eps))
        assert abs(auto - fd) <= 1e-5 * max(1.0, abs(fd)), (auto, fd)

    def test_material_diffuse(self):
        self.check_leaf(
            lambda g: g.mat_diffuse[1],
            lambda s, d: dataclasses.replace(
                s, mat_diffuse=s.mat_diffuse.at[1].add(d)))

    def test_material_ambient(self):
        self.check_leaf(
            lambda g: g.mat_ambient[0],
            lambda s, d: dataclasses.replace(
                s, mat_ambient=s.mat_ambient.at[0].add(d)))

    def test_light_intensity(self):
        def bump(scene, d):
            new_light = dataclasses.replace(
                scene.lights[0],
                intensity=scene.lights[0].intensity.at[0].add(d))
            return dataclasses.replace(scene, lights=(new_light,))

        scene, cam = small_setup()
        grad_scene = scene_grad(scene, cam)
        auto = float(grad_scene.lights[0].intensity[0])
        eps = 1e-6
        fd = float((loss_of(bump(scene, eps), cam)
                    - loss_of(bump(scene, -eps), cam)) / (2 * eps))
        assert abs(auto - fd) <= 1e-5 * max(1.0, abs(fd)), (auto, fd)

    def test_pattern_color(self):
        scene, cam = small_setup()
        grad_scene = scene_grad(scene, cam)
        pat = scene.patterns[1]  # ball's solid pattern

        def bump(d):
            new_pat = dataclasses.replace(pat, color=pat.color.at[0].add(d))
            return dataclasses.replace(
                scene, patterns=(scene.patterns[0], new_pat))

        auto = float(grad_scene.patterns[1].color[0])
        eps = 1e-6
        fd = float((loss_of(bump(eps), cam) - loss_of(bump(-eps), cam))
                   / (2 * eps))
        assert abs(auto - fd) <= 1e-5 * max(1.0, abs(fd)), (auto, fd)

    def test_object_transform(self):
        # prim_inv is the composed world->object affine; a smooth leaf.
        scene, cam = small_setup()
        grad_scene = scene_grad(scene, cam)
        auto = float(grad_scene.prim_inv[1, 1, 3])  # sphere ty of inverse

        def bump(d):
            return dataclasses.replace(
                scene, prim_inv=scene.prim_inv.at[1, 1, 3].add(d))

        eps = 1e-6
        fd = float((loss_of(bump(eps), cam) - loss_of(bump(-eps), cam))
                   / (2 * eps))
        # Silhouette pixels contribute discontinuously; interior shading
        # dominates at this step size.
        assert abs(auto - fd) <= 1e-4 * max(1.0, abs(fd)), (auto, fd)


class TestTorusGrad:
    def test_torus_radius_finite_difference(self):
        """Quartic differentiability: sqrt/cbrt/arccos all hit their
        infinite-derivative points on masked branches (disc = 0,
        arg = ±1), and 0 * inf = NaN poisoned every torus-scene
        gradient until the _gsqrt/_gcbrt/_gacos clamped-JVP forms
        (round 5). Pins: all leaves finite, and d(loss)/d(minor_radius)
        matches central finite differences."""
        floor = Shape("plane", material=Material(
            pattern=Pattern.solid([0.9, 0.9, 0.9]), specular=0.0))
        torus = Shape("torus", minor_radius=0.3,
                      transform=mu.compose([mu.translate(0, 0.3, 0),
                                            mu.rotate_x(np.pi / 2)]),
                      material=Material(
                          pattern=Pattern.solid([0.7, 0.3, 0.2]),
                          specular=0.0))
        light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
        scene = compile_scene([floor, torus], [light], dtype=jnp.float64)
        cam_h = Camera(24, 16, np.pi / 3)
        cam_h.transform = mu.view_transform([0, 1.5, -4], [0, 0.5, 0],
                                            [0, 1, 0])
        cam = compile_camera(cam_h, jnp.float64)
        st = dataclasses.replace(SET, max_hits=8, containers_depth=4)

        def loss(s):
            return jnp.mean(render(s, cam, settings=st) ** 2)

        g = jax.grad(loss, allow_int=True)(scene)
        for leaf in jax.tree_util.tree_leaves(g):
            if hasattr(leaf, "dtype") and \
                    jnp.issubdtype(leaf.dtype, jnp.floating) and leaf.size:
                assert bool(jnp.isfinite(leaf).all())
        auto = float(g.tor_r[0])
        eps = 1e-6
        bump = lambda d: dataclasses.replace(
            scene, tor_r=scene.tor_r.at[0].add(d))
        fd = float((loss(bump(eps)) - loss(bump(-eps))) / (2 * eps))
        assert abs(auto - fd) <= 1e-5 * max(1.0, abs(fd)), (auto, fd)


class TestInverseRendering:
    def test_training_reduces_loss(self):
        scene, cam = small_setup()
        target = render(scene, cam, settings=SET)

        # Corrupt the ball color + light intensity, then recover.
        bad_pat = dataclasses.replace(
            scene.patterns[1],
            color=jnp.asarray([0.2, 0.7, 0.7], jnp.float64))
        bad_light = dataclasses.replace(
            scene.lights[0], intensity=scene.lights[0].intensity * 0.5)
        bad = dataclasses.replace(scene,
                                  patterns=(scene.patterns[0], bad_pat),
                                  lights=(bad_light,))

        optimizer = optax.adam(5e-2)
        trainable = lambda ks: ".color" in ks or ".intensity" in ks
        state, rest = ptrain.init_train_state(bad, optimizer, trainable)
        step = ptrain.make_train_step(rest, cam, SET, optimizer)
        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(25):
            state, loss = step(state, target, key)
            losses.append(float(loss))
        assert losses[-1] < 0.05 * losses[0], losses[::6]


TEAPOT = "/root/reference/examples/teapot-low.obj"


@pytest.mark.skipif(not __import__("os").path.exists(TEAPOT),
                    reason="no reference fixture")
class TestMeshGrad:
    """Differentiable mesh rendering. The Pallas triangle/BVH kernels
    define no AD rule; `ops/soa._kernel_closest` gives them a custom VJP
    that recomputes the winning triangle's Möller–Trumbore partials in
    plain XLA (winner held locally constant). Gradients through the
    kernel path (interpret mode on CPU; the same VJP runs on device)
    must match the natively differentiable XLA chunk path, and the XLA
    path itself must match finite differences on mesh geometry."""

    def _setup(self, dtype):
        from rray_tpu.io.obj_loader import load_obj_file

        mesh = load_obj_file(TEAPOT, Material(
            pattern=Pattern.solid([0.8, 0.5, 0.3]), specular=0.3,
            reflective=0.1))
        mesh.transform = mu.compose([mu.rotate_x(-np.pi / 2),
                                     mu.scale(0.12, 0.12, 0.12)])
        floor = Shape("plane", material=Material(
            pattern=Pattern.solid([0.9, 0.9, 0.9]), specular=0.0))
        light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
        scene = compile_scene([floor, mesh], [light], dtype=dtype)
        cam_h = Camera(24, 16, np.pi / 3)
        cam_h.transform = mu.view_transform([0, 1.5, -4], [0, 0.7, 0],
                                            [0, 1, 0])
        cam = compile_camera(cam_h, dtype)
        return scene, cam

    def _grads(self, scene, cam, settings):
        params, rest = ptrain.partition_scene(scene)
        g = jax.grad(lambda p: jnp.mean(
            render(ptrain.merge_scene(p, rest), cam,
                   settings=settings) ** 2))(params)
        return [np.asarray(l) for l in jax.tree_util.tree_leaves(g)]

    def _check_kernel_vs_xla(self, extra):
        scene, cam = self._setup(jnp.float32)
        base = dataclasses.replace(SET, rows_per_tile=16, tri_chunk=64,
                                   **extra)
        a = self._grads(scene, cam,
                        dataclasses.replace(base, pallas="interpret"))
        b = self._grads(scene, cam, dataclasses.replace(base, pallas="off"))
        assert any(x.size and np.abs(x).max() > 0 for x in a)
        for x, y in zip(a, b):
            if not y.size:
                continue
            # allclose treats NaN==NaN as equal; grads must be finite
            # (masked-lane normalize once leaked 0*inf NaNs in f32).
            assert np.isfinite(x).all() and np.isfinite(y).all()
            scale = max(1e-3, float(np.abs(y).max()))
            np.testing.assert_allclose(x, y, rtol=5e-3, atol=5e-4 * scale)

    def test_linear_kernel_grad_matches_xla(self):
        self._check_kernel_vs_xla({})

    def test_bvh_kernel_grad_matches_xla(self):
        # 240 tris >= bvh_min_tris=64 routes through the LBVH kernel.
        self._check_kernel_vs_xla({"bvh_min_tris": 64})

    def test_mesh_geometry_finite_difference(self):
        # Pins geometry-gradient semantics on the XLA path (f64): moving
        # one vertex component changes shading smoothly away from
        # silhouettes.
        scene, cam = self._setup(jnp.float64)
        settings = dataclasses.replace(SET, rows_per_tile=16, tri_chunk=64)
        params, rest = ptrain.partition_scene(scene)

        def loss(p):
            return jnp.mean(render(ptrain.merge_scene(p, rest), cam,
                                   settings=settings) ** 2)

        g = jax.grad(loss)(params)
        g_scene = ptrain.merge_scene(g, rest)
        # Largest-gradient vertex-normal component (smooth in shading).
        gn = np.asarray(g_scene.tri_n1)
        i, j = np.unravel_index(np.abs(gn).argmax(), gn.shape)
        auto = float(gn[i, j])
        eps = 1e-6
        bump = lambda d: dataclasses.replace(
            scene, tri_n1=scene.tri_n1.at[i, j].add(d))
        pb, _ = ptrain.partition_scene(bump(eps))
        mb, _ = ptrain.partition_scene(bump(-eps))
        fd = float((loss(pb) - loss(mb)) / (2 * eps))
        assert abs(auto - fd) <= 1e-4 * max(1.0, abs(fd)), (auto, fd)


class TestWavefrontGradEquivalence:
    """The compact wavefront's AD plumbing (jax.checkpoint on the scan
    body + the compaction sort's fixed-permutation custom VJP) must not
    change gradient VALUES — remat is an identity, and the permutation
    VJP is the exact derivative wherever the sort order is locally
    constant. Pins glass-scene gradients across remat on/off and
    compact-vs-exhaustive wavefronts."""

    def _glass_setup(self):
        floor = Shape("plane", material=Material(
            pattern=Pattern.solid([0.9, 0.9, 0.9]), specular=0.0,
            reflective=0.1))
        ball = Shape("sphere", transform=mu.translate(0, 1, 0),
                     material=Material(pattern=Pattern.solid([0.1, 0.1, 0.1]),
                                       diffuse=0.1, specular=1.0,
                                       reflective=0.9, transparency=0.9,
                                       refractive_index=1.5))
        light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
        scene = compile_scene([floor, ball], [light], dtype=jnp.float64)
        cam_h = Camera(16, 12, np.pi / 3)
        cam_h.transform = mu.view_transform([0, 1.5, -5], [0, 1, 0],
                                            [0, 1, 0])
        cam = compile_camera(cam_h, jnp.float64)
        return scene, cam

    def _grads(self, scene, cam, settings):
        params, rest = ptrain.partition_scene(scene)
        g = jax.grad(lambda p: jnp.mean(
            render(ptrain.merge_scene(p, rest), cam,
                   settings=settings) ** 2))(params)
        return [np.asarray(l) for l in jax.tree_util.tree_leaves(g)]

    def test_remat_identity(self):
        scene, cam = self._glass_setup()
        base = dataclasses.replace(SET, max_hits=8, containers_depth=4)
        a = self._grads(scene, cam, dataclasses.replace(base, remat=True))
        b = self._grads(scene, cam, dataclasses.replace(base, remat=False))
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, rtol=1e-12, atol=1e-14)

    def test_compact_full_capacity_matches_scan(self):
        scene, cam = self._glass_setup()
        base = dataclasses.replace(SET, max_hits=8, containers_depth=4,
                                   wavefront_capacity=2 ** SET.depth)
        a = self._grads(scene, cam, dataclasses.replace(base,
                                                        wavefront="compact"))
        b = self._grads(scene, cam, dataclasses.replace(base,
                                                        wavefront="scan"))
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, rtol=1e-9, atol=1e-12)
