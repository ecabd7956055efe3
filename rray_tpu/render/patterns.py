"""Pattern-tree evaluation, specialized per scene at trace time.

The reference evaluates a recursive Pattern enum per shading point
(material/pattern.rs:145-215). Scenes are static per render, so instead of
a runtime interpreter we unroll each pattern tree into straight-line jnp
ops at trace time and select between the (few) distinct roots by the
hit primitive's pattern id. Semantics preserved exactly, including:

* every node applies its own transform inverse first (pattern.rs:146);
* stripe/ring/checker floor-parity tests (pattern.rs:154-181);
* gradient lerps by frac(x), so it repeats (pattern.rs:161-167);
* blend = a*(1-s) + b*s (pattern.rs:182-186);
* perturbed displaces the point by three fBm samples at (z, z+1, z+2)
  scaled by `scale` (pattern.rs:187-199);
* noise picks a or b scaled by |noise*scale| (pattern.rs:200-208);
* texture uses the *object's* uv_mapping on the pattern-space point and
  nearest-neighbor sampling with clamped uv and a v-flip
  (texture.rs:32-54).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import noise as fnl
from ..ops import normals as nrm
from ..scene import data as sd


def _apply_inv(inv, pts):
    return jnp.einsum("ij,rj->ri", inv[:, :3], pts) + inv[:, 3]


def _even(x):
    # (floor(x) as i32) % 2 == 0 — remainder sign doesn't matter for == 0.
    return jnp.mod(jnp.floor(x), 2.0) == 0.0


def _sample_texture(texture, u, v):
    h, w = texture.shape[0], texture.shape[1]
    u = jnp.clip(u, 0.0, 1.0)
    v = jnp.clip(v, 0.0, 1.0)
    x = jnp.minimum((u * w).astype(jnp.int32), w - 1)
    y = jnp.minimum((v * h).astype(jnp.int32), h - 1)
    y = h - y - 1  # v=0 is the bottom row (texture.rs:41-42)
    if texture.dtype == jnp.uint32:
        # Packed 8-bit RGB (scene/data.py); unpack to u8/255 floats.
        px = texture[y, x]
        return jnp.stack([((px >> 16) & 0xFF), ((px >> 8) & 0xFF),
                          (px & 0xFF)], axis=-1) / 255.0
    return texture[y, x]


def eval_pattern(node: sd.PatternData, pts, uv_ctx):
    """Color of `node` at object-space points [R,3] -> [R,3].

    uv_ctx: callable(pattern_pts [R,3]) -> (u, v) for Texture nodes —
    bound to the hit primitive's uv_mapping.
    """
    p = _apply_inv(node.inv, pts)
    t = node.ptype
    if t == "solid":
        return jnp.broadcast_to(node.color[None, :], p.shape)
    if t == "test":
        return p
    if t == "stripe":
        cond = _even(p[:, 0])
        return jnp.where(cond[:, None], eval_pattern(node.a, p, uv_ctx),
                         eval_pattern(node.b, p, uv_ctx))
    if t == "gradient":
        a = eval_pattern(node.a, p, uv_ctx)
        b = eval_pattern(node.b, p, uv_ctx)
        frac = (p[:, 0] - jnp.floor(p[:, 0]))[:, None]
        return a + (b - a) * frac
    if t == "ring":
        r = jnp.sqrt(p[:, 0] ** 2 + p[:, 2] ** 2)
        cond = _even(r)
        return jnp.where(cond[:, None], eval_pattern(node.a, p, uv_ctx),
                         eval_pattern(node.b, p, uv_ctx))
    if t == "checker":
        s = jnp.floor(p[:, 0]) + jnp.floor(p[:, 1]) + jnp.floor(p[:, 2])
        cond = jnp.mod(s, 2.0) == 0.0
        return jnp.where(cond[:, None], eval_pattern(node.a, p, uv_ctx),
                         eval_pattern(node.b, p, uv_ctx))
    if t == "blend":
        a = eval_pattern(node.a, p, uv_ctx)
        b = eval_pattern(node.b, p, uv_ctx)
        return a * (1.0 - node.scale) + b * node.scale
    if t == "perturbed":
        x, y, z = p[:, 0], p[:, 1], p[:, 2]
        oct_, pers = node.octaves, node.persistence
        nx = fnl.octave_perlin(x, y, z, oct_, pers) * node.scale
        ny = fnl.octave_perlin(x, y, z + 1.0, oct_, pers) * node.scale
        nz = fnl.octave_perlin(x, y, z + 2.0, oct_, pers) * node.scale
        moved = p + jnp.stack([nx, ny, nz], -1)
        return eval_pattern(node.a, moved, uv_ctx)
    if t == "noise":
        n = fnl.octave_perlin(p[:, 0], p[:, 1], p[:, 2], node.octaves,
                              node.persistence) * node.scale
        a = eval_pattern(node.a, p, uv_ctx)
        b = eval_pattern(node.b, p, uv_ctx)
        return jnp.where((n <= 0.0)[:, None], a * (-n)[:, None], b * n[:, None])
    if t == "image":
        u, v = uv_ctx(p)
        return _sample_texture(node.texture, u, v)
    raise ValueError(f"unknown pattern type {t!r}")


def pattern_at_object(scene: sd.SceneData, prim, world_pts):
    """pattern_at_object (material.rs:77-80): world -> object space, then
    the prim's pattern root; roots are evaluated per scene-root and merged
    by pattern id."""
    obj_pts = nrm.local_point(scene, prim, world_pts)
    pid = scene.pattern_id[prim]

    def uv_ctx(pattern_pts):
        return nrm.uv_at(scene, prim, pattern_pts)

    out = jnp.zeros_like(world_pts)
    if len(scene.patterns) == 1:
        return eval_pattern(scene.patterns[0], obj_pts, uv_ctx)
    for i, root in enumerate(scene.patterns):
        color = eval_pattern(root, obj_pts, uv_ctx)
        out = jnp.where((pid == i)[:, None], color, out)
    return out
