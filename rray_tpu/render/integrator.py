"""The Whitted integrator as a statically-unrolled wavefront.

`Scene::color_at`'s depth-5 recursion (scene.rs:128-136,159-178) becomes a
trace-time-unrolled ray tree over whole ray batches: at each node we
intersect, shade all lights (with shadow rays), then spawn reflection and
refraction child batches. Host-static scene flags prune the tree — a scene
with no transparent material compiles to a pure reflection chain (6
passes) instead of the full 63-node tree.

All branching is masked math; missed rays carry sanitized (zeroed)
geometry so no NaNs leak into gradients.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RenderSettings, offset_eps
from ..ops import hits as hits_mod
from ..ops import normals as nrm
from ..scene import data as sd
from . import patterns
from .camera import CameraData, all_rays


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _reflect(v, n):
    return v - n * (2.0 * _dot(v, n))[:, None]


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)


def _schlick(eyev, normalv, n1, n2):
    """Fresnel approximation (computations.rs:39-54)."""
    cos = _dot(eyev, normalv)
    n = n1 / n2
    sin2_t = n * n * (1.0 - cos * cos)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    cos_eff = jnp.where(n1 > n2, cos_t, cos)
    r0 = ((n1 - n2) / (n1 + n2)) ** 2
    reflectance = r0 + (1.0 - r0) * (1.0 - cos_eff) ** 5
    tir = (n1 > n2) & (sin2_t > 1.0)
    return jnp.where(tir, 1.0, reflectance)


def _lighting(scene, prim, base_color, light, point, eyev, normalv, shadow_frac):
    """Phong (light.rs:98-140). `shadow_frac` in [0,1]."""
    effective = base_color * light.intensity[None, :]
    lightv = _normalize(light.position[None, :] - point)
    ambient = effective * scene.mat_ambient[prim][:, None]
    ldn = _dot(lightv, normalv)
    lit = ldn >= 0.0
    diffuse = effective * (scene.mat_diffuse[prim] * ldn)[:, None]
    reflectv = _reflect(-lightv, normalv)
    rde = _dot(reflectv, eyev)
    spec_on = lit & (rde > 0.0)
    factor = jnp.power(jnp.maximum(rde, 1e-30), scene.mat_shininess[prim])
    specular = light.intensity[None, :] * (scene.mat_specular[prim] * factor)[:, None]
    diffuse = jnp.where(lit[:, None], diffuse, 0.0)
    specular = jnp.where(spec_on[:, None], specular, 0.0)
    return ambient + (diffuse + specular) * (1.0 - shadow_frac)[:, None]


def _shadow_fraction(scene, light, over, settings, key):
    """Point lights: binary; area lights: level^2 jittered-grid samples
    (scene.rs:181-214, light.rs:47-65). Sampling uses a seeded PRNG instead
    of the reference's thread_rng (documented deviation)."""
    R = over.shape[0]
    dtype = over.dtype
    if light.kind == "point":
        v = light.position[None, :] - over
        dist = jnp.linalg.norm(v, axis=-1)
        direction = v / jnp.maximum(dist[:, None], 1e-30)
        shadowed = hits_mod.shadow_hit(scene, over, direction, dist, settings)
        return shadowed.astype(dtype)
    level = light.level
    n = level * level
    rand = jax.random.uniform(key, (n, R, 2), dtype=dtype)
    cols = (jnp.arange(n) % level).astype(dtype)
    rows = (jnp.arange(n) // level).astype(dtype)
    ur = (cols[:, None] + rand[:, :, 0]) / level
    vr = (rows[:, None] + rand[:, :, 1]) / level
    pos = (light.corner[None, None, :]
           + light.uvec[None, None, :] * ur[:, :, None]
           + light.vvec[None, None, :] * vr[:, :, None])  # [n,R,3]
    over_t = jnp.broadcast_to(over[None, :, :], pos.shape).reshape(n * R, 3)
    pos_f = pos.reshape(n * R, 3)
    v = pos_f - over_t
    dist = jnp.linalg.norm(v, axis=-1)
    direction = v / jnp.maximum(dist[:, None], 1e-30)
    shadowed = hits_mod.shadow_hit(scene, over_t, direction, dist, settings)
    return jnp.mean(shadowed.reshape(n, R).astype(dtype), axis=0)


def color_at(scene: sd.SceneData, ro, rd, remaining: int,
             settings: RenderSettings, key):
    """Color seen along rays [R,3]; the unrolled Whitted tree."""
    dtype = ro.dtype
    eps = offset_eps(dtype)
    # The full sorted hit prefix is only needed when CSG filtering or the
    # refraction containers walk consume it; otherwise the closest positive
    # hit is a straight masked argmin (no lax.sort, no top-K tensors).
    needs_sorted = bool(scene.csg_ops) or scene.has_transparent
    if needs_sorted:
        slots = hits_mod.gather_sorted_hits(scene, ro, rd, settings)
        found, hit_idx, t, prim, u, v = hits_mod.select_hit(slots)
    else:
        found, t, prim, u, v = hits_mod.closest_hit(scene, ro, rd, settings)

    t_safe = jnp.where(found, t, 0.0)
    point = ro + rd * t_safe[:, None]
    eyev = -rd
    normalv = nrm.normal_at(scene, prim, u, v, point)
    inside = _dot(normalv, eyev) < 0.0
    normalv = jnp.where(inside[:, None], -normalv, normalv)
    over = point + normalv * eps
    under = point - normalv * eps
    reflectv = _reflect(rd, normalv)

    if scene.has_transparent:
        n1, n2 = hits_mod.refractive_indices(scene, slots, hit_idx,
                                             settings.containers_depth)
    else:
        n1 = n2 = jnp.ones_like(t)

    # Surface term: pattern color once, then per-light Phong + shadows.
    base_color = patterns.pattern_at_object(scene, prim, over)
    surface = jnp.zeros_like(ro)
    for li, light in enumerate(scene.lights):
        lk = jax.random.fold_in(key, 1000 + li)
        frac = _shadow_fraction(scene, light, over, settings, lk)
        surface = surface + _lighting(scene, prim, base_color, light, over,
                                      eyev, normalv, frac)

    reflective = scene.mat_reflective[prim]
    transparency = scene.mat_transparency[prim]
    reflected = jnp.zeros_like(ro)
    refracted = jnp.zeros_like(ro)

    if remaining > 0 and scene.has_reflective:
        rc = color_at(scene, over, reflectv, remaining - 1, settings,
                      jax.random.fold_in(key, 1))
        reflected = rc * reflective[:, None]

    if remaining > 0 and scene.has_transparent:
        n_ratio = n1 / n2
        cos_i = _dot(eyev, normalv)
        sin2_t = n_ratio * n_ratio * (1.0 - cos_i * cos_i)
        tir = sin2_t > 1.0
        cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
        direction = (normalv * (n_ratio * cos_i - cos_t)[:, None]
                     - eyev * n_ratio[:, None])
        live = found & ~tir & (transparency > 0.0)
        safe_dir = jnp.where(live[:, None], direction,
                             jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], dtype),
                                              direction.shape))
        rc = color_at(scene, under, safe_dir, remaining - 1, settings,
                      jax.random.fold_in(key, 2))
        refracted = jnp.where(live[:, None], rc * transparency[:, None], 0.0)

    if scene.has_reflective and scene.has_transparent:
        both = (reflective > 0.0) & (transparency > 0.0)
        reflectance = _schlick(eyev, normalv, n1, n2)
        blended = (reflected * reflectance[:, None]
                   + refracted * (1.0 - reflectance)[:, None])
        secondary = jnp.where(both[:, None], blended, reflected + refracted)
    else:
        secondary = reflected + refracted

    color = surface + secondary
    return jnp.where(found[:, None], color, 0.0)


def render(scene: sd.SceneData, cam: CameraData,
           settings: RenderSettings = RenderSettings(), seed: int = 0):
    """Full-frame render -> image [vsize, hsize, 3] (linear, unclamped)."""
    ro, rd = all_rays(cam)
    key = jax.random.PRNGKey(seed)
    R = ro.shape[0]
    tile = max(settings.rows_per_tile * cam.hsize, 1)
    pad = (-R) % tile
    if pad:
        ro = jnp.concatenate([ro, jnp.zeros((pad, 3), ro.dtype)], 0)
        rd = jnp.concatenate([rd, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], rd.dtype),
                                           (pad, 1))], 0)
    n_tiles = (R + pad) // tile
    ro_t = ro.reshape(n_tiles, tile, 3)
    rd_t = rd.reshape(n_tiles, tile, 3)

    def tile_fn(args):
        o, d = args
        return color_at(scene, o, d, settings.depth, settings, key)

    if n_tiles == 1:
        colors = tile_fn((ro_t[0], rd_t[0]))[:R]
    else:
        colors = jax.lax.map(tile_fn, (ro_t, rd_t)).reshape(-1, 3)[:R]
    return colors.reshape(cam.vsize, cam.hsize, 3)


def render_jit(scene, cam, settings: RenderSettings = RenderSettings(),
               seed: int = 0):
    fn = jax.jit(render, static_argnames=("settings", "seed"))
    return fn(scene, cam, settings=settings, seed=seed)
