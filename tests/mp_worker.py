"""Worker for the 2-process jax.distributed render test (test_parallel).

Usage: python mp_worker.py <coordinator> <num_procs> <pid> <out.npy>
Each process owns 4 virtual CPU devices; the global mesh spans 8.
Covers distributed.init_distributed + global_mesh + host_local_image.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main(coordinator, num_procs, pid, out):
    import jax.numpy as jnp

    from rray_tpu import (Camera, Material, Pattern, PointLight,
                          RenderSettings, Shape, compile_camera,
                          compile_scene)
    from rray_tpu import mathutils as mu
    from rray_tpu.parallel import distributed as dist
    from rray_tpu.parallel import mesh as pmesh

    ok = dist.init_distributed(coordinator, num_procs, pid)
    assert ok, "expected multi-process init"
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == 4 * num_procs, len(jax.devices())

    floor = Shape("plane", material=Material(
        pattern=Pattern("checker", a=Pattern.solid([1.0, 1.0, 1.0]),
                        b=Pattern.solid([0.2, 0.2, 0.2])), specular=0.0))
    ball = Shape("sphere", transform=mu.translate(0, 1, 0),
                 material=Material(pattern=Pattern.solid([0.7, 0.2, 0.2]),
                                   reflective=0.3))
    light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
    scene = compile_scene([floor, ball], [light], dtype=jnp.float32)
    cam_h = Camera(64, 32, np.pi / 3)
    cam_h.transform = mu.view_transform([0, 1.5, -5], [0, 1, 0], [0, 1, 0])
    cam = compile_camera(cam_h, jnp.float32)

    mesh = dist.global_mesh()
    img = pmesh.render_sharded_jit(scene, cam, mesh,
                                   settings=RenderSettings(rows_per_tile=32))
    full = dist.host_local_image(img)
    assert full.shape == (32, 64, 3), full.shape
    np.save(out, full)
    print("mp ok", pid, flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
