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


def test_elastic_render_survives_crashes(tmp_path):
    """Failure-detection/elastic path (api.render_resilient): each child
    process dies after 2 bands (injected device loss); retries resume
    from the band checkpoint and the assembled PNG matches a direct
    render."""
    import os

    from PIL import Image

    from rray_tpu.api import render_resilient, render_scene_from_file

    scene_yaml = tmp_path / "scene.yaml"
    scene_yaml.write_text("""
camera:
  fov: 60
  from: [0, 1.5, -5.0]
  to: [0, 1, 0]
  up: [0, 1, 0]
lights:
  - type: point
    color: [1, 1, 1]
    position: [-10, 10, -10]
scene:
  - type: sphere
    transforms:
      - type: translate
        amount: [0, 1, 0]
    material:
      pattern:
        type: solid
        color: [0.7, 0.2, 0.2]
  - type: plane
    material:
      pattern:
        type: checker
        color_a: [1, 1, 1]
        color_b: [0.2, 0.2, 0.2]
      specular: 0
""")
    png = str(tmp_path / "out.png")
    ckpt = str(tmp_path / "frame.npz")
    os.environ["RRAY_FAIL_AFTER_BANDS"] = "2"
    try:
        rc = render_resilient(str(scene_yaml), 32, 24, png, band_rows=8,
                              checkpoint_path=ckpt, attempts=4,
                              platform="cpu")
    finally:
        del os.environ["RRAY_FAIL_AFTER_BANDS"]
    assert rc == 0
    # 3 bands at 2 per process -> at least 2 processes were needed.
    state = np.load(ckpt)
    assert state["done"].all()
    got = np.asarray(Image.open(png).convert("RGB"), np.int32)
    want_img = render_scene_from_file(str(scene_yaml), 32, 24, "",
                                      dtype=jnp.float32)
    from rray_tpu.render.canvas import to_u8
    want = to_u8(want_img).astype(np.int32)
    assert np.abs(got - want).max() <= 1
