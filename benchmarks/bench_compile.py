"""Graph-size / compile-time probe for the CSG+glass slot machinery.

VERDICT r1 flagged the O(K^2)-O(K^3) unrolled n1/n2 + CSG loops as a
compile-time risk; they were reformulated as O(K) lax.scans (ops/soa.py
refractive_indices_soa / apply_csg_soa). This prints trace+lower wall
time and StableHLO line count for one csg_showcase tile at a sweep of
max_hits, so any future K-blowup is visible.

Run: python benchmarks/bench_compile.py  (host-side; CPU is fine)
"""
import json
import os
import sys
import time

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rray_tpu import Camera, RenderSettings, compile_camera
    from rray_tpu.render.integrator import render
    from bench_suite import load

    scene, _ = load(os.path.join(BASE, "examples", "csg_showcase.yaml"),
                    1920, 1080, jnp.float32)
    cam_h = Camera(1920, 54, 0.9)
    cam = compile_camera(cam_h, jnp.float32)

    for K in (8, 16, 24, 32):
        settings = RenderSettings(rows_per_tile=54, max_hits=K,
                                  containers_depth=4)
        t0 = time.time()
        lowered = jax.jit(render, static_argnames=("settings", "seed")).lower(
            scene, cam, settings=settings, seed=0)
        trace_s = time.time() - t0
        hlo_lines = lowered.as_text().count("\n")
        t0 = time.time()
        lowered.compile()
        compile_s = time.time() - t0
        print(json.dumps({"metric": "csg_compile", "max_hits": K,
                          "trace_lower_s": round(trace_s, 2),
                          "xla_compile_s": round(compile_s, 2),
                          "stablehlo_lines": hlo_lines}), flush=True)


if __name__ == "__main__":
    main()
