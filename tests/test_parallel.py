"""SPMD rendering on the 8-virtual-device CPU mesh: sharded output must
match the single-device render exactly; the sharded train step must run
and produce finite grads."""
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
