"""Mesh-scene throughput probe (BASELINE config 4 analog): a ~3k-triangle
procedural UV-sphere mesh with smooth normals + checker floor, 800x600."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def uv_sphere_obj(n_lat=40, n_lon=40):
    """Generate OBJ text for a smooth UV sphere (~2*n_lat*n_lon triangles)."""
    lines = []
    for i in range(n_lat + 1):
        theta = np.pi * i / n_lat
        for j in range(n_lon):
            phi = 2 * np.pi * j / n_lon
            x = np.sin(theta) * np.cos(phi)
            y = np.cos(theta)
            z = np.sin(theta) * np.sin(phi)
            lines.append(f"v {x} {y} {z}")
            lines.append(f"vn {x} {y} {z}")

    def vid(i, j):
        return i * n_lon + (j % n_lon) + 1

    for i in range(n_lat):
        for j in range(n_lon):
            a, b = vid(i, j), vid(i + 1, j)
            c, d = vid(i + 1, j + 1), vid(i, j + 1)
            if i > 0:
                lines.append(f"f {a}//{a} {b}//{b} {d}//{d}")
            if i < n_lat - 1:
                lines.append(f"f {b}//{b} {c}//{c} {d}//{d}")
    return "\n".join(lines)


def main(n_lat=40, n_lon=40, width=800, height=600):
    import jax
    import jax.numpy as jnp
    from rray_tpu.api import enable_compile_cache
    enable_compile_cache()
    from rray_tpu import (Camera, Material, Pattern, PointLight,
                          RenderSettings, Shape, compile_camera,
                          compile_scene)
    from rray_tpu import mathutils as mu
    from rray_tpu.io.obj_loader import load_obj_str
    from rray_tpu.render.integrator import render

    dtype = jnp.float32
    mesh = load_obj_str(uv_sphere_obj(n_lat, n_lon),
                        Material(pattern=Pattern.solid([0.7, 0.5, 0.2])))
    mesh.transform = mu.translate(0, 1, 0)
    floor = Shape("plane", material=Material(
        pattern=Pattern("checker", a=Pattern.solid([1.0, 1.0, 1.0]),
                        b=Pattern.solid([0.2, 0.2, 0.2])), specular=0.0))
    light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
    scene = compile_scene([floor, mesh], [light], dtype=dtype)
    print(f"triangles: {scene.counts[6]}", file=sys.stderr)

    cam_h = Camera(width, height, np.pi / 3)
    cam_h.transform = mu.view_transform([0, 1.5, -5], [0, 1, 0], [0, 1, 0])
    cam = compile_camera(cam_h, dtype)

    import dataclasses
    from rray_tpu.utils.timing import measure_frame_seconds
    settings = RenderSettings(rows_per_tile=600, max_hits=4,
                              containers_depth=2, tri_chunk=1024)

    def render_scalar(jitter):
        c = dataclasses.replace(cam, half_width=cam.half_width + jitter * 1e-9)
        return render(scene, c, settings=settings).sum()

    sec = measure_frame_seconds(render_scalar)
    rays = width * height
    print(json.dumps({"metric": "mesh_primary_rays_per_s",
                      "value": rays / sec, "unit": "rays/s",
                      "tris": int(scene.counts[6]),
                      "frame_s": sec}))


if __name__ == "__main__":
    main()
