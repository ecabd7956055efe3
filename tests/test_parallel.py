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
