"""SPMD rendering on the 8-virtual-device CPU mesh: sharded output must
match the single-device render exactly; the sharded train step must run
and produce finite grads."""
import os
import jax
import jax.numpy as jnp
import numpy as np
import optax

from rray_tpu import (Camera, Material, Pattern, PointLight, RenderSettings,
                      Shape, compile_camera, compile_scene)
from rray_tpu import mathutils as mu
from rray_tpu.parallel import mesh as pmesh
from rray_tpu.parallel import train as ptrain
from rray_tpu.render.integrator import render

SET = RenderSettings(rows_per_tile=48, max_hits=4, containers_depth=2)


def setup(dtype=jnp.float64):
    floor = Shape("plane", material=Material(
        pattern=Pattern("checker", a=Pattern.solid([1.0, 1.0, 1.0]),
                        b=Pattern.solid([0.2, 0.2, 0.2])), specular=0.0))
    ball = Shape("sphere", transform=mu.translate(0, 1, 0),
                 material=Material(pattern=Pattern.solid([0.7, 0.2, 0.2]),
                                   diffuse=0.7))
    light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
    scene = compile_scene([floor, ball], [light], dtype=dtype)
    cam_h = Camera(32, 24, np.pi / 3)
    cam_h.transform = mu.view_transform([0, 1.5, -5], [0, 1, 0], [0, 1, 0])
    return scene, compile_camera(cam_h, dtype)


TET_OBJ = """
v 0 1.6 -0.2
v 0.9 0.3 -0.7
v -0.9 0.3 -0.7
v 0 0.3 1.0
f 1 2 3
f 1 3 4
f 1 4 2
f 2 4 3
"""


def hard_setup(dtype=jnp.float64, mesh_in_csg=False, area_extent=1e-6,
               width=28, height=20):
    """Glass + CSG + mesh + area light: every hard integrator path at
    once — the compact wavefront (reflective AND transparent, so the
    custom-VJP top-W compaction runs), the CSG slot machinery
    (csg.rs:177-195 filtering), area-light sampling, and the triangle
    chunk path — none of which the simple fast-path scene touches.

    `area_extent` defaults to a degenerate (1e-6-sized) area light: the
    full level^2 jittered-sample machinery runs, but every sample sees
    the same occlusion, so the shadow fraction is jitter-independent and
    sharded-vs-single comparisons stay EXACT despite the device-index
    key fold. `mesh_in_csg=True` puts a tetrahedron inside the CSG,
    forcing the full ordered slot list (sorted_slots_full_soa) instead
    of the analytic-members hybrid."""
    from rray_tpu import AreaLight
    from rray_tpu.io.obj_loader import load_obj_str

    floor = Shape("plane", material=Material(
        pattern=Pattern("checker", a=Pattern.solid([1.0, 1.0, 1.0]),
                        b=Pattern.solid([0.2, 0.2, 0.2])),
        specular=0.0, reflective=0.15))
    glass = Shape("sphere", transform=mu.translate(-0.8, 1, 0.2),
                  material=Material(pattern=Pattern.solid([0.05, 0.05, 0.05]),
                                    transparency=0.9, refractive_index=1.5,
                                    reflective=0.9, diffuse=0.1))
    tet = load_obj_str(TET_OBJ, Material(
        pattern=Pattern.solid([0.7, 0.5, 0.2])))
    if mesh_in_csg:
        tet.transform = mu.translate(1.6, 0, 0.5)
        csg = Shape("csg", operation="difference", left=tet,
                    right=Shape("sphere",
                                transform=mu.compose(
                                    [mu.translate(1.6, 0.9, 0.2),
                                     mu.scale(0.5, 0.5, 0.5)]),
                                material=Material(
                                    pattern=Pattern.solid([0.2, 0.6, 0.3]))))
        shapes = [floor, glass, csg]
    else:
        cube = Shape("cube", transform=mu.compose(
            [mu.translate(1.6, 0.5, 0.5), mu.scale(0.5, 0.5, 0.5)]),
            material=Material(pattern=Pattern.solid([0.8, 0.3, 0.3])))
        ball = Shape("sphere", transform=mu.compose(
            [mu.translate(1.9, 0.9, 0.2), mu.scale(0.45, 0.45, 0.45)]),
            material=Material(pattern=Pattern.solid([0.2, 0.6, 0.3])))
        csg = Shape("csg", operation="difference", left=cube, right=ball)
        tet.transform = mu.translate(0.6, 0, -1.2)
        shapes = [floor, glass, csg, tet]
    lights = [
        PointLight(np.array([-10.0, 10.0, -10.0]), np.full(3, 0.7)),
        AreaLight(np.array([5.0, 6.0, -5.0]),
                  np.array([area_extent, 0.0, 0.0]),
                  np.array([0.0, area_extent, 0.0]),
                  np.full(3, 0.4), level=2),
    ]
    scene = compile_scene(shapes, lights, dtype=dtype)
    cam_h = Camera(width, height, np.pi / 3)
    cam_h.transform = mu.view_transform([0, 1.8, -4.5], [0.4, 0.8, 0],
                                        [0, 1, 0])
    return scene, compile_camera(cam_h, dtype)


HARD_SET = RenderSettings(rows_per_tile=20, max_hits=12, containers_depth=4,
                          wavefront_capacity=4)


class TestShardedRender:
    def test_matches_single_device(self):
        assert jax.device_count() >= 8, "conftest should provide 8 devices"
        scene, cam = setup()
        mesh = pmesh.make_mesh(jax.devices()[:8])
        single = np.asarray(render(scene, cam, settings=SET))
        sharded = np.asarray(pmesh.render_sharded_jit(scene, cam, mesh,
                                                      settings=SET))
        np.testing.assert_allclose(sharded, single, atol=1e-12)

    def test_uneven_rays_padding(self):
        scene, cam = setup()
        # 63x37 raster: 2331 rays, not divisible by 8.
        cam_h = Camera(63, 37, np.pi / 3)
        cam_h.transform = mu.view_transform([0, 1.5, -5], [0, 1, 0], [0, 1, 0])
        cam2 = compile_camera(cam_h, jnp.float64)
        mesh = pmesh.make_mesh(jax.devices()[:8])
        single = np.asarray(render(scene, cam2, settings=SET))
        sharded = np.asarray(pmesh.render_sharded_jit(scene, cam2, mesh,
                                                      settings=SET))
        np.testing.assert_allclose(sharded, single, atol=1e-12)


class TestShardedHardPaths:
    """Sharding coverage for the paths the simple scene never touches:
    compact wavefront (glass), CSG slot filtering (hybrid AND full
    ordered slots with a mesh operand), area-light sampling, triangle
    chunks — each must match the single-device render exactly (the
    degenerate area light makes the shadow fraction jitter-independent,
    see hard_setup)."""

    def test_glass_csg_mesh_area_matches_single(self):
        scene, cam = hard_setup()
        assert scene.has_reflective and scene.has_transparent
        assert scene.csg_ops and scene.counts[6] == 4
        mesh = pmesh.make_mesh(jax.devices()[:8])
        single = np.asarray(render(scene, cam, settings=HARD_SET))
        sharded = np.asarray(pmesh.render_sharded_jit(scene, cam, mesh,
                                                      settings=HARD_SET))
        assert np.isfinite(sharded).all()
        np.testing.assert_allclose(sharded, single, atol=1e-12)

    def test_real_area_light_matches_single(self):
        """A REAL-extent area light under shard_map: jitter is keyed by
        the shadow origin's bits (ops/jitter.py), not the tile/shard
        layout, so even soft penumbras match the single-device render
        exactly (rounds 1-3 could only compare degenerate lights)."""
        scene, cam = hard_setup(area_extent=1.5)
        mesh = pmesh.make_mesh(jax.devices()[:8])
        single = np.asarray(render(scene, cam, settings=HARD_SET))
        sharded = np.asarray(pmesh.render_sharded_jit(scene, cam, mesh,
                                                      settings=HARD_SET))
        np.testing.assert_allclose(sharded, single, atol=1e-12)

    def test_mesh_inside_csg_matches_single(self):
        """Tetrahedron as a CSG operand: forces the full ordered slot
        list (sorted_slots_full_soa) under shard_map."""
        from rray_tpu.ops import soa

        scene, cam = hard_setup(mesh_in_csg=True)
        assert scene.csg_ops and not soa.csg_members_analytic(scene)
        mesh = pmesh.make_mesh(jax.devices()[:8])
        single = np.asarray(render(scene, cam, settings=HARD_SET))
        sharded = np.asarray(pmesh.render_sharded_jit(scene, cam, mesh,
                                                      settings=HARD_SET))
        assert np.isfinite(sharded).all()
        np.testing.assert_allclose(sharded, single, atol=1e-12)

    def test_buffer_caps_tile_each_shard(self):
        """A max_rc_elems small enough that one shard exceeds it must
        split each device's block into lax.map tiles (the single-device
        `_tile_rays` cap applied per shard) — and still match."""
        import dataclasses as dc

        from rray_tpu.render import integrator

        scene, cam = hard_setup()
        s = dc.replace(HARD_SET, max_rc_elems=1344)
        R = cam.hsize * cam.vsize
        # The cap must actually bite: tile < one 8-device shard.
        assert integrator._tile_rays(scene, cam, s) < -(-R // 8)
        mesh = pmesh.make_mesh(jax.devices()[:8])
        single = np.asarray(render(scene, cam, settings=s))
        sharded = np.asarray(pmesh.render_sharded_jit(scene, cam, mesh,
                                                      settings=s))
        np.testing.assert_allclose(sharded, single, atol=1e-12)

    def test_train_step_through_compact_wavefront(self):
        """Sharded training on the glass+CSG scene: the compaction's
        custom VJP and the slot machinery's gradients under shard_map
        + psum."""
        scene, cam = hard_setup(jnp.float32, width=24, height=16)
        mesh = pmesh.make_mesh(jax.devices()[:8])
        target = jnp.zeros((cam.vsize, cam.hsize, 3), jnp.float32)
        optimizer = optax.adam(1e-2)
        state, rest = ptrain.init_train_state(scene, optimizer)
        step = ptrain.make_train_step(rest, cam, HARD_SET, optimizer,
                                      mesh=mesh, axis=pmesh.RAY_AXIS)
        state, loss = step(state, target, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(state.params)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        state, loss2 = step(state, target, jax.random.PRNGKey(0))
        assert float(loss2) < float(loss)


class TestShardedTraining:
    def test_train_step_on_mesh(self):
        scene, cam = setup(jnp.float32)
        mesh = pmesh.make_mesh(jax.devices()[:8])
        target = jnp.zeros((cam.vsize, cam.hsize, 3), jnp.float32)
        optimizer = optax.adam(1e-2)
        state, rest = ptrain.init_train_state(scene, optimizer)
        step = ptrain.make_train_step(rest, cam, SET, optimizer,
                                      mesh=mesh, axis=pmesh.RAY_AXIS)
        state, loss = step(state, target, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))
        state, loss2 = step(state, target, jax.random.PRNGKey(0))
        assert float(loss2) < float(loss)


class TestMultiProcess:
    """2-process jax.distributed CPU simulation (SURVEY §5 distributed
    backend): covers init_distributed + global_mesh + host_local_image
    end-to-end via subprocesses (4 virtual devices each, global mesh of
    8), asserting the assembled frame matches a single-process render."""

    def test_two_process_render_matches(self, tmp_path):
        import socket
        import subprocess
        import sys as _sys

        worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        outs = [str(tmp_path / f"mp{i}.npy") for i in range(2)]
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        procs = [subprocess.Popen(
            [_sys.executable, worker, f"localhost:{port}", "2", str(i),
             outs[i]], env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT) for i in range(2)]
        for p in procs:
            out, _ = p.communicate(timeout=240)
            assert p.returncode == 0, out.decode()[-2000:]

        # Reference: the same scene single-process (mp_worker's scene).
        floor = Shape("plane", material=Material(
            pattern=Pattern("checker", a=Pattern.solid([1.0, 1.0, 1.0]),
                            b=Pattern.solid([0.2, 0.2, 0.2])),
            specular=0.0))
        ball = Shape("sphere", transform=mu.translate(0, 1, 0),
                     material=Material(
                         pattern=Pattern.solid([0.7, 0.2, 0.2]),
                         reflective=0.3))
        light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
        scene = compile_scene([floor, ball], [light], dtype=jnp.float32)
        cam_h = Camera(64, 32, np.pi / 3)
        cam_h.transform = mu.view_transform([0, 1.5, -5], [0, 1, 0],
                                            [0, 1, 0])
        cam = compile_camera(cam_h, jnp.float32)
        single = np.asarray(render(
            scene, cam, settings=RenderSettings(rows_per_tile=32)))

        a = np.load(outs[0])
        b = np.load(outs[1])
        np.testing.assert_array_equal(a, b)
        # Multi-process shards fold the device index into the RNG key the
        # same way the virtual-mesh path does; the point-light scene has
        # no RNG, so frames agree to f32 cross-compile tolerance.
        np.testing.assert_allclose(a, single, atol=1e-4)
