"""Progressive rendering: band accumulation equals the one-shot frame;
checkpoint files resume with no recomputation of finished bands."""
import jax.numpy as jnp
import numpy as np

from rray_tpu import (Camera, Material, Pattern, PointLight, RenderSettings,
                      Shape, compile_camera, compile_scene)
from rray_tpu import mathutils as mu
from rray_tpu.render.integrator import render
from rray_tpu.render.progressive import ProgressiveRender

SET = RenderSettings(rows_per_tile=16)


def setup():
    floor = Shape("plane", material=Material(
        pattern=Pattern("checker", a=Pattern.solid([1.0, 1.0, 1.0]),
                        b=Pattern.solid([0.2, 0.2, 0.2])), specular=0.0))
    ball = Shape("sphere", transform=mu.translate(0, 1, 0),
                 material=Material(pattern=Pattern.solid([0.7, 0.2, 0.2])))
    light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
    scene = compile_scene([floor, ball], [light], dtype=jnp.float64)
    cam_h = Camera(32, 24, np.pi / 3)
    cam_h.transform = mu.view_transform([0, 1.5, -5], [0, 1, 0], [0, 1, 0])
    return scene, compile_camera(cam_h, jnp.float64)


def test_bands_match_one_shot():
    scene, cam = setup()
    one_shot = np.asarray(render(scene, cam, settings=SET))
    prog = ProgressiveRender(scene, cam, settings=SET, band_rows=7)
    out = prog.run()
    np.testing.assert_allclose(out, one_shot, atol=1e-12)


def test_checkpoint_resume(tmp_path):
    scene, cam = setup()
    path = str(tmp_path / "ckpt.npz")
    prog = ProgressiveRender(scene, cam, settings=SET, band_rows=8,
                             checkpoint_path=path)
    prog.run(bands=[0, 2])  # partial render
    resumed = ProgressiveRender.resume(path, scene, cam, settings=SET)
    assert resumed.done.sum() == 2
    out = resumed.run()  # finishes band 1
    assert resumed.done.all()
    one_shot = np.asarray(render(scene, cam, settings=SET))
    np.testing.assert_allclose(out, one_shot, atol=1e-12)
