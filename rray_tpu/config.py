"""Global configuration for the rray_tpu renderer.

Mirrors the reference's single global constant EPSILON = 1e-5
(/root/reference/src/main.rs:10) while adding TPU-specific knobs:
compute dtype (float32 on TPU, float64 for CPU parity tests) and
static pipeline sizes (hit slots, container stack depth, bounce depth).
"""
from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp

# Float comparison / shadow-acne epsilon (reference: src/main.rs:10).
EPSILON = 1e-5


def default_dtype():
    """Compute dtype for the device render path.

    float64 requires jax_enable_x64 (CPU parity tests); TPU uses float32.
    """
    if os.environ.get("RRAY_F64") == "1" or jax.config.jax_enable_x64:
        return jnp.float64
    return jnp.float32


def offset_eps(dtype) -> float:
    """Surface offset used for over_point/under_point.

    The reference offsets by EPSILON in f64 (intersection.rs:57-58). In f32
    that is below round-off at scene scale, so we widen it to keep shadow
    and refraction rays off the originating surface.
    """
    if dtype == jnp.float64:
        return EPSILON
    return 1e-3


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static (compile-time) settings for one render pipeline."""

    # Max sorted hit slots kept per ray. Must cover every intersection at
    # t < first-visible-hit plus the hit itself (CSG filtering and the
    # refraction containers walk both consume the sorted prefix).
    max_hits: int = 16
    # Containers stack depth for the n1/n2 walk (intersection.rs:61-92).
    containers_depth: int = 8
    # Recursion depth for reflection/refraction (camera.rs:113 hardcodes 5).
    depth: int = 5
    # Triangles are streamed through the hit merger in chunks of this size.
    tri_chunk: int = 512
    # Pixel rows rendered per device step (bounds wavefront memory).
    rows_per_tile: int = 64
    # Cap on rays-per-tile x tri_chunk elements (bounds the [R, C]
    # ray/triangle intermediates; 32M f32 elems = 128 MB per buffer).
    max_rc_elems: int = 32 * 1024 * 1024
    # Pallas triangle kernel: "auto" (TPU + float32), "on", "off", or
    # "interpret" (debugging on CPU).
    pallas: str = "auto"
    # Meshes with at least this many triangles traverse the BVH kernel
    # (HBM-streamed leaves); smaller ones use the VMEM-resident
    # linear-chunk kernel, whose fixed cost is lower.
    bvh_min_tris: int = 1024
    # BVH leaf size (triangles per HBM-streamed leaf). The trade is
    # fold work (every entered leaf intersects all 512 block rays)
    # against tree depth (serial traversal steps); the round-5 sweep on
    # the 6320-tri teapot measured 128 fastest (78 M rays/s vs 74 M at
    # 256 and 64, 64 M at 32). auto_leaf may raise this for very large
    # meshes.
    bvh_leaf: int = 128
    # Whitted wavefront implementation: "compact" (capacity-bounded
    # per-level live-ray compaction; default), "scan" (level-synchronous,
    # fixed 2^depth width), or "unrolled" (one body per depth level —
    # exact tree work but a graph the remote TPU compiler may not
    # survive).
    wavefront: str = "compact"
    # Compact-wavefront capacity: max live paths PER PIXEL per depth
    # level; a pixel holding more nonzero-weight paths drops the
    # lowest-weight ones. 2^depth reproduces the exhaustive scan
    # bit-exactly; 4 is visually exact on the BASELINE glass scene
    # (max |diff| ~1e-4 in linear color, ~3% of one u8 step; A/B-tested).
    wavefront_capacity: int = 4
    # Rematerialize the per-level wavefront body under reverse-mode AD
    # (jax.checkpoint on the scan body). Identity outside jax.grad; under
    # grad it trades one extra forward per level for not storing every
    # level's node-eval residuals (together with the compaction's
    # fixed-permutation VJP: 171x -> 7.9x backward/forward on the glass
    # scene). Gradients are bit-identical either way.
    remat: bool = True
