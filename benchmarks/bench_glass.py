"""Glass-scene throughput (BASELINE config 2): reflective+refractive
spheres, full 5-bounce Whitted tree with Schlick blending."""
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(width=800, height=600):
    import jax.numpy as jnp
    from rray_tpu.api import enable_compile_cache
    enable_compile_cache()
    from rray_tpu import Camera, RenderSettings, compile_camera, compile_scene
    from rray_tpu.io.yaml_loader import load_scene_file
    from rray_tpu.render.integrator import render
    from rray_tpu.utils.timing import device_seconds_per_call, repeat_with_jitter

    base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cam_spec, lights, shapes = load_scene_file(
        os.path.join(base, "examples", "glass.yaml"))
    scene = compile_scene(shapes, lights, dtype=jnp.float32)
    cam_h = Camera(width, height, cam_spec["fov"])
    cam_h.transform = cam_spec["transform"]
    cam = compile_camera(cam_h, jnp.float32)
    settings = RenderSettings(rows_per_tile=600, max_hits=16,
                              containers_depth=4)

    def render_scalar(jitter):
        c = dataclasses.replace(cam, half_width=cam.half_width + jitter * 1e-9)
        return render(scene, c, settings=settings).sum()

    sec = device_seconds_per_call(
        lambda n: repeat_with_jitter(render_scalar, n), n=201)
    rays = width * height
    print(json.dumps({"metric": "glass_primary_rays_per_s",
                      "value": rays / sec, "unit": "rays/s",
                      "frame_s": sec}))


if __name__ == "__main__":
    main()
