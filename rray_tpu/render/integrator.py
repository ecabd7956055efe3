"""The Whitted integrator as a scan-based wavefront.

`Scene::color_at`'s depth-5 recursion (scene.rs:128-136,159-178) becomes
batched node evaluations under lax.scan: each node intersects, shades all
lights (with shadow rays), and hands reflection/refraction children to
the next scan step as fixed-width ray state with scalar path weights
(the tree is a weighted sum over root-to-node paths). One node body per
graph — unrolled multi-level graphs crash the remote TPU compiler.

Three regimes share the shading semantics (all SoA component math —
ops/vec.py, ops/soa.py, render/shade_soa.py):

* **Fast path** (no CSG, no transparency): closest hit by running masked
  min, shadows by any-hit, reflection chain scan (width 1).
* **Transparency without CSG**: closest hit + slot-free n1/n2 crossing-
  parity reductions (intersection.rs:61-92 semantics), wavefront width
  2^depth when reflection also spawns.
* **CSG scenes** (csg.rs:177-195 filtering needs slot order): per-ray
  sorted [K, R] slot lists via a compare-swap network.

All branching is masked math; missed rays carry sanitized geometry so no
NaNs leak into gradients. The AoS variants (_color_at_sorted, ops/hits)
remain as the A/B oracle for tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import RenderSettings, offset_eps
from ..ops import hits as hits_mod
from ..ops import jitter as jitter_mod
from ..ops import normals as nrm
from ..ops import soa
from ..ops.vec import V3
from ..scene import data as sd
from . import patterns
from . import shade_soa
from .camera import (CameraData, all_rays, all_rays_soa,
                     rays_for_pixels_soa)


# ---------------------------------------------------------------------------
# SoA fast path
# ---------------------------------------------------------------------------

def _shadow_test_soa(scene, over: V3, direction: V3, dist, settings):
    if scene.csg_ops:
        if soa.csg_members_analytic(scene):
            return soa.any_hit_hybrid(scene, over, direction, dist, settings)
        return soa.any_hit_sorted_soa(scene, over, direction, dist, settings)
    return soa.any_hit_soa(scene, over, direction, dist, settings)


def _shadow_fraction_soa(scene, light, over: V3, settings, key):
    """Point: binary; area: level^2 jittered-grid samples folded into the
    ray axis (scene.rs:181-214, light.rs:47-65; seeded PRNG instead of
    thread_rng — documented deviation)."""
    dtype = over.dtype
    if light.kind == "point":
        to_light = V3(light.position[0] - over.x, light.position[1] - over.y,
                      light.position[2] - over.z)
        dist = to_light.norm()
        direction = to_light * (1.0 / jnp.maximum(dist, 1e-30))
        shadowed = _shadow_test_soa(scene, over, direction, dist, settings)
        return shadowed.astype(dtype)

    level = light.level
    n = level * level
    R = over.x.shape[0]
    # Point-keyed hash jitter (ops/jitter.py): a draw is a pure function
    # of (key-derived seed, shadow-origin f32 bits), so it is invariant
    # to tiling/swizzling/sharding (sharded == single is now EXACT for
    # area scenes) and the fused kernels can recompute the identical
    # draws in-register instead of streaming a [2n, R] array through
    # HBM. Replaces the rbg draws of rounds 1-3 — the sampler is a
    # documented deviation from the reference's thread_rng either way
    # (seeded + deterministic here). Both XLA and kernel shadow paths
    # consume bit-identical draws (integer hashing is exact).
    sg = jax.lax.stop_gradient
    seed = jitter_mod.seed_from_key(key)
    rand = jitter_mod.point_jitter(seed, sg(over.x), sg(over.y),
                                   sg(over.z), n, dtype=dtype)

    from ..kernels import analytic as kanl
    if (soa._use_pallas(settings, dtype) and not scene.csg_ops
            and not scene.counts[6] and scene.prim_kinds
            and all(k in kanl.OCCLUSION_KINDS for k in scene.prim_kinds)):
        # The WHOLE sample loop as one Pallas call per tile
        # (kernels/analytic.py): the XLA scan's per-step chain splits
        # across fusions with HBM round trips (measured ~5x); same
        # draws, same predicates, same integer sums — bit-identical.
        # The fraction is a sum of indicators (zero gradient a.e., like
        # the comparison-based path), so gradients stop here.
        sg = jax.lax.stop_gradient
        params = soa._occlusion_params(scene, range(len(scene.prim_kinds)))
        light_params = jnp.concatenate([light.corner, light.uvec,
                                        light.vvec])
        return kanl.area_shadow_fraction(
            (sg(over.x), sg(over.y), sg(over.z)), sg(rand),
            sg(light_params), sg(params), tuple(scene.prim_kinds),
            level,
            interpret=getattr(settings, "pallas", "off") == "interpret")

    cols = (jnp.arange(n) % level).astype(dtype)
    rows = (jnp.arange(n) // level).astype(dtype)

    # `level` samples per scan step at [level*R] width: the earlier
    # [n*R] tiled batch materialized ~10 frame-sized arrays per sample
    # set through HBM (shadow sampling was 84% of the area-light frame),
    # while fully serial [R] steps left the VPU underfed — one row per
    # step measured 1.79 ms vs 1.49 ms for level-sized groups on the
    # 2400x1800 BASELINE tile (g=n regresses to the HBM-bound form).
    # Same PRNG draws and per-sample math; the group sum of 0/1 samples
    # is integer-exact, so results are bit-identical.
    g = level
    rep = lambda c: jnp.tile(c, g)
    over_g = V3(rep(over.x), rep(over.y), rep(over.z))

    def body(acc, xs):
        r0, r1, col, row = xs  # r0/r1: [g, R]; col/row: [g]
        ur = (col[:, None] + r0).reshape(g * R) / level
        vr = (row[:, None] + r1).reshape(g * R) / level
        pos = V3(light.corner[0] + light.uvec[0] * ur + light.vvec[0] * vr,
                 light.corner[1] + light.uvec[1] * ur + light.vvec[1] * vr,
                 light.corner[2] + light.uvec[2] * ur + light.vvec[2] * vr)
        # Normalized direction, like the reference: an unnormalized
        # segment with dist=1 tests the same predicate in exact math but
        # rescales the EPSILON guards inside the slot forms (plane
        # |dy| >= eps, cylinder |a| > eps, cone linear case) by |seg|^2,
        # misclassifying short/long shadow segments.
        to_light = pos - over_g
        dist = to_light.norm()
        direction = to_light * (1.0 / jnp.maximum(dist, 1e-30))
        shadowed = _shadow_test_soa(scene, over_g, direction, dist,
                                    settings)
        return acc + shadowed.astype(dtype).reshape(g, R).sum(0), None

    # zeros_like keeps the carry's varying-axis type equal to the body
    # output's under shard_map (a fresh jnp.zeros is "unvarying" and
    # trips the scan carry typecheck).
    acc, _ = jax.lax.scan(body, jnp.zeros_like(over.x),
                          (rand[0].reshape(level, g, R),
                           rand[1].reshape(level, g, R),
                           cols.reshape(level, g), rows.reshape(level, g)))
    return acc / n


def _lighting_soa(scene, reader, base: V3, light, point: V3, eyev: V3,
                  normalv: V3, shadow_frac):
    """Phong (light.rs:98-140). Material scalars come from the class
    reader (one select-sum each, not per-prim gathers)."""
    li = light.intensity
    effective = V3(base.x * li[0], base.y * li[1], base.z * li[2])
    lightv = V3(light.position[0] - point.x, light.position[1] - point.y,
                light.position[2] - point.z).normalize()
    amb = reader.col(sd.CLS_AMBIENT)
    ambient = effective * amb
    ldn = lightv.dot(normalv)
    lit = ldn >= 0.0
    dscale = jnp.where(lit, reader.col(sd.CLS_DIFFUSE) * ldn, 0.0)
    reflectv = (-lightv).reflect(normalv)
    rde = reflectv.dot(eyev)
    spec_on = lit & (rde > 0.0)
    factor = jnp.power(jnp.maximum(rde, 1e-30),
                       reader.col(sd.CLS_SHININESS))
    sscale = jnp.where(spec_on, reader.col(sd.CLS_SPECULAR) * factor, 0.0)
    unshadow = 1.0 - shadow_frac
    return V3(
        ambient.x + (effective.x * dscale + li[0] * sscale) * unshadow,
        ambient.y + (effective.y * dscale + li[1] * sscale) * unshadow,
        ambient.z + (effective.z * dscale + li[2] * sscale) * unshadow)


def _fast_node_eval(scene: sd.SceneData, ro: V3, rd: V3,
                    settings: RenderSettings, key):
    """One fast-path node: closest hit + full surface shade.

    Returns (surface V3 masked by found, over V3, reflect dir V3,
    reflect weight [R] masked by found)."""
    dtype = ro.dtype
    eps = offset_eps(dtype)
    hit = soa.closest_hit_soa(scene, ro, rd, settings)
    found = hit.found
    t_safe = jnp.where(found, hit.t, 0.0)
    point = ro + rd * t_safe
    eyev = -rd

    reader = shade_soa.ClassReader(scene, hit.prim, cls=hit.cls)
    aff = reader.affine_inv()
    lp = shade_soa.apply_gathered_point(aff, point)
    normalv = shade_soa.normal_at(scene, hit, point, lp, reader=reader)
    inside = normalv.dot(eyev) < 0.0
    flip = jnp.where(inside, -1.0, 1.0)
    normalv = normalv * flip
    over = point + normalv * eps

    # Pattern is evaluated at over_point (scene.rs:165, light.rs:104).
    lp_over = shade_soa.apply_gathered_point(aff, over)
    base = shade_soa.pattern_at(scene, hit, lp_over, reader=reader)

    surface = V3(jnp.zeros_like(point.x), jnp.zeros_like(point.x),
                 jnp.zeros_like(point.x))
    for li_i, light in enumerate(scene.lights):
        lk = jax.random.fold_in(key, 1000 + li_i)
        frac = _shadow_fraction_soa(scene, light, over, settings, lk)
        surface = surface + _lighting_soa(scene, reader, base, light, over,
                                          eyev, normalv, frac)
    surface = V3(jnp.where(found, surface.x, 0.0),
                 jnp.where(found, surface.y, 0.0),
                 jnp.where(found, surface.z, 0.0))

    refl = jnp.where(found, reader.col(sd.CLS_REFLECTIVE), 0.0)
    return surface, over, rd.reflect(normalv), refl


def _color_at_soa(scene: sd.SceneData, ro: V3, rd: V3, remaining: int,
                  settings: RenderSettings, key) -> V3:
    """Fast path (no CSG/transparency): kernel or XLA dispatcher.

    The fused Whitted kernel takes this path only when the scene has an
    area light (fusing the node around the sample loop pays) or a
    triangle mesh (the fused scalar-broadcast fold beat the standalone
    [1, BR]-row kernels' per-chunk/per-dispatch overheads — config4
    decomposition measured the two standalone kernels at 96% of frame
    time); pure point-light analytic scenes already run at ~roofline
    in XLA (config1: 10 G rays/s) and a kernel's I/O materialization
    would only slow them down."""
    from ..kernels import whitted as kwhit
    take = (kwhit.applicable(scene, settings, ro.dtype)
            and (scene.counts[6] or scene.counts[5]
                 or any(light.kind == "area" for light in scene.lights)
                 or not all(kwhit._tree_cheap(p)
                            for p in scene.patterns)))
    if (take and scene.counts[6] and scene.has_reflective
            and getattr(settings, "pallas", "off") == "auto"):
        # CAN fuse, but measured slower: the in-kernel mesh fold
        # replays per bounce level (44 M) while the XLA node pays only
        # live-tile triangle kernels (56 M on the reflective-floor
        # teapot). pallas="on"/"interpret" still force the fused path
        # (capability + A/B tests); "auto" picks the faster one.
        take = False
    if take:
        outs = _whitted_kernel_call(
            scene, (ro.x, ro.y, ro.z, rd.x, rd.y, rd.z), key, remaining,
            settings)
        return V3(*outs)
    return _color_at_soa_xla(scene, ro, rd, remaining, settings, key)


def _color_at_soa_xla(scene: sd.SceneData, ro: V3, rd: V3, remaining: int,
                      settings: RenderSettings, key) -> V3:
    """Fast path (no CSG/transparency): surface + reflection chain.

    The chain runs under lax.scan (weights carry the reflective product),
    so the node body compiles once regardless of depth — the unrolled
    multi-level graphs crash the remote TPU compiler."""
    if remaining == 0 or not scene.has_reflective:
        surface, *_ = _fast_node_eval(scene, ro, rd, settings,
                                      jax.random.fold_in(key, 0))
        return surface

    acc0 = V3(jnp.zeros_like(ro.x), jnp.zeros_like(ro.x),
              jnp.zeros_like(ro.x))
    weights0 = jnp.ones_like(ro.x)

    def body(carry, level):
        origins, dirs, weights, acc = carry
        lk = jax.random.fold_in(key, level)

        def live_fn(_):
            surface, over, reflectv, refl = _fast_node_eval(
                scene, origins, dirs, settings, lk)
            return over, reflectv, weights * refl, surface * weights

        def dead_fn(_):
            z = jnp.zeros_like(weights)
            return origins, dirs, weights, V3(z, z, z)

        # Reflection chains die as soon as a bounce lands on a
        # non-reflective surface (weight product hits exact zero —
        # scene.rs:281-290); a tile whose chains all died pays only the
        # cond. With swizzled (block-compact) tiles this skips most
        # levels on most tiles.
        over, reflectv, weights_n, contrib = jax.lax.cond(
            jnp.any(weights != 0.0), live_fn, dead_fn, None)
        return (over, reflectv, weights_n, acc + contrib), None

    if getattr(settings, "remat", True):
        body = jax.checkpoint(body)
    (_, _, _, acc), _ = jax.lax.scan(
        body, (ro, rd, weights0, acc0), jnp.arange(remaining + 1))
    return acc


def _schlick_soa(eyev: V3, normalv: V3, n1, n2):
    """Fresnel approximation (computations.rs:39-54), component form.

    The sqrt clamp floor is 1e-30, not 0: at TIR the clamp is active and
    sqrt'(0)=inf meets the clamp's zero cotangent — 0*inf NaNs that
    contaminate every scene parameter's gradient. The floor keeps the
    partial finite; forward values change only when 0 < 1-sin2_t < 1e-30
    (measure-zero), and at TIR cos_t is discarded anyway."""
    cos = eyev.dot(normalv)
    n = n1 / n2
    sin2_t = n * n * (1.0 - cos * cos)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 1e-30))
    cos_eff = jnp.where(n1 > n2, cos_t, cos)
    r0 = ((n1 - n2) / (n1 + n2)) ** 2
    reflectance = r0 + (1.0 - r0) * (1.0 - cos_eff) ** 5
    tir = (n1 > n2) & (sin2_t > 1.0)
    return jnp.where(tir, 1.0, reflectance)


def _sorted_node_eval(scene: sd.SceneData, ro: V3, rd: V3,
                      settings: RenderSettings, key):
    """One sorted-path Whitted node over a ray batch (component form).

    Returns (surface V3, over V3, under V3, reflect dir V3, refract dir
    V3, reflect weight [R], refract weight [R]) — the weights carry the
    reference's reflective/transparency factors with the Schlick blend
    pre-applied when both are active (scene.rs:159-178), so the Whitted
    ray TREE evaluates as a weighted SUM over tree paths.
    """
    dtype = ro.dtype
    eps = offset_eps(dtype)
    member_slots = None
    if scene.csg_ops and soa.csg_members_analytic(scene):
        # Hybrid CSG path: only CSG-operand slots need sorting/filtering
        # (non-member slots never toggle the filter state and are always
        # kept — csg.rs:177-195); everything else rides the fast
        # masked-min path, incl. meshes outside any CSG.
        hit, member_slots = soa.closest_hit_hybrid(scene, ro, rd, settings)
        slots = None
        found, t, prim = hit.found, hit.t, hit.prim
        zero = jnp.zeros_like(t)
    elif scene.csg_ops:
        # Mesh inside a CSG: full ordered slot list.
        if scene.counts[6]:
            slots = soa.sorted_slots_full_soa(scene, ro, rd, settings)
        else:
            slots = soa.sorted_slots_soa(scene, ro, rd)
        slots = soa.apply_csg_soa(scene, slots)
        sel = soa.select_hit_slots(slots)
        found, t, prim, hit_idx = sel[:4]
        zero = jnp.zeros_like(t)
        if len(sel) > 4:
            hit_u, hit_v, hit_tri = sel[4:]
            hit = soa.Hit(found=found, t=t, prim=prim, u=hit_u, v=hit_v,
                          tri=hit_tri)
        else:
            hit = soa.Hit(found=found, t=t, prim=prim, u=zero, v=zero,
                          tri=jnp.zeros_like(prim))
    else:
        # Transparency without CSG: closest hit directly; n1/n2 come from
        # the slot-free crossing-parity reduction below.
        slots = None
        hit = soa.closest_hit_soa(scene, ro, rd, settings)
        found, t, prim = hit.found, hit.t, hit.prim
        zero = jnp.zeros_like(t)

    t_safe = jnp.where(found, t, 0.0)
    point = ro + rd * t_safe
    eyev = -rd
    reader = shade_soa.ClassReader(scene, prim, cls=hit.cls)
    aff = reader.affine_inv()
    lp = shade_soa.apply_gathered_point(aff, point)
    normalv = shade_soa.normal_at(scene, hit, point, lp, reader=reader)
    inside = normalv.dot(eyev) < 0.0
    normalv = normalv * jnp.where(inside, -1.0, 1.0)
    over = point + normalv * eps
    under = point - normalv * eps

    if scene.has_transparent and slots is not None:
        n1, n2 = soa.refractive_indices_soa(scene, slots, hit_idx,
                                            settings.containers_depth)
    elif scene.has_transparent:
        n1, n2 = soa.refractive_indices_direct(
            scene, ro, rd, jnp.where(found, t, -1.0), prim, settings,
            member_slots=member_slots)
    else:
        n1 = n2 = jnp.ones_like(t)

    lp_over = shade_soa.apply_gathered_point(aff, over)
    base = shade_soa.pattern_at(scene, hit, lp_over, reader=reader)
    surface = V3(zero, zero, zero)
    for li_i, light in enumerate(scene.lights):
        lk = jax.random.fold_in(key, 1000 + li_i)
        frac = _shadow_fraction_soa(scene, light, over, settings, lk)
        surface = surface + _lighting_soa(scene, reader, base, light, over,
                                          eyev, normalv, frac)
    surface = V3(jnp.where(found, surface.x, 0.0),
                 jnp.where(found, surface.y, 0.0),
                 jnp.where(found, surface.z, 0.0))

    reflective = jnp.where(found, reader.col(sd.CLS_REFLECTIVE), 0.0)
    transparency = jnp.where(found, reader.col(sd.CLS_TRANSPARENCY), 0.0)

    reflectv = rd.reflect(normalv)
    # Refraction direction + TIR (scene.rs:310-336). The 1e-30 sqrt
    # floor (vs 0) avoids inf*0 NaN cotangents at TIR — see _schlick_soa.
    n_ratio = n1 / n2
    cos_i = eyev.dot(normalv)
    sin2_t = n_ratio * n_ratio * (1.0 - cos_i * cos_i)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 1e-30))
    direction = normalv * (n_ratio * cos_i - cos_t) - eyev * n_ratio
    live = found & ~tir & (transparency > 0.0)
    refr_dir = V3(jnp.where(live, direction.x, 0.0),
                  jnp.where(live, direction.y, 0.0),
                  jnp.where(live, direction.z, 1.0))

    refl_w = reflective
    refr_w = jnp.where(live, transparency, 0.0)
    if scene.has_reflective and scene.has_transparent:
        both = (reflective > 0.0) & (transparency > 0.0)
        reflectance = _schlick_soa(eyev, normalv, n1, n2)
        refl_w = jnp.where(both, reflective * reflectance, refl_w)
        refr_w = jnp.where(both, refr_w * (1.0 - reflectance), refr_w)

    return surface, over, under, reflectv, refr_dir, refl_w, refr_w


def _concat_v3(a: V3, b: V3) -> V3:
    return V3(jnp.concatenate([a.x, b.x]), jnp.concatenate([a.y, b.y]),
              jnp.concatenate([a.z, b.z]))


def _color_at_sorted_scan(scene: sd.SceneData, ro: V3, rd: V3,
                          remaining: int, settings: RenderSettings,
                          key) -> V3:
    """Whitted wavefront as ONE lax.scan over depth levels.

    The level-unrolled variant compiles depth+1 copies of the node graph
    (~10k HLO ops for glass scenes), which the remote TPU compile service
    cannot survive. Here the node body compiles once: ray state lives in
    fixed-width [W*R] component arrays (W = 2^depth when both reflection
    and refraction spawn, else 1) with heap-ordered children (parent row
    i -> rows 2i, 2i+1) and zero path weights marking dead rays. Work is
    W*(depth+1) ray-evaluations vs the tree's 2^(depth+1)-1 — a ~3x
    overhead in the both-spawn case, traded for a ~6x smaller graph.
    """
    spawn_refl = scene.has_reflective
    spawn_refr = scene.has_transparent
    both = spawn_refl and spawn_refr
    W = 2 ** remaining if both else 1
    R = ro.x.shape[0]
    dtype = ro.dtype

    def expand(c, fill):
        # Constants derive from `c` (x*0+fill), not jnp.full: fresh
        # constants are "unvarying" under shard_map and trip the scan
        # carry typecheck against the body's varying outputs.
        if W == 1:
            return c
        return jnp.concatenate([c, jnp.tile(c * 0.0 + fill, W - 1)])

    origins = V3(expand(ro.x, 0.0), expand(ro.y, 0.0), expand(ro.z, 0.0))
    dirs = V3(expand(rd.x, 0.0), expand(rd.y, 0.0), expand(rd.z, 1.0))
    weights = expand(ro.x * 0.0 + 1.0, 0.0)
    zR = ro.x * 0.0
    acc0 = V3(zR, zR, zR)

    def interleave(a, b):
        # Children of the first W//2 parent rows, heap order.
        A = a.reshape(W, R)[: W // 2]
        B = b.reshape(W, R)[: W // 2]
        return jnp.stack([A, B], axis=1).reshape(W * R)

    def inter_v3(a: V3, b: V3) -> V3:
        return V3(interleave(a.x, b.x), interleave(a.y, b.y),
                  interleave(a.z, b.z))

    def body(carry, level):
        origins, dirs, weights, acc = carry
        lk = jax.random.fold_in(key, level)
        surface, over, under, reflectv, refr_dir, refl_w, refr_w = \
            _sorted_node_eval(scene, origins, dirs, settings, lk)
        contrib = surface * weights
        acc = acc + V3(contrib.x.reshape(W, R).sum(0),
                       contrib.y.reshape(W, R).sum(0),
                       contrib.z.reshape(W, R).sum(0))
        if both:
            origins = inter_v3(over, under)
            dirs = inter_v3(reflectv, refr_dir)
            weights = interleave(weights * refl_w, weights * refr_w)
        elif spawn_refl:
            origins, dirs = over, reflectv
            weights = weights * refl_w
        else:
            origins, dirs = under, refr_dir
            weights = weights * refr_w
        return (origins, dirs, weights, acc), None

    if not (spawn_refl or spawn_refr):
        surface, *_ = _sorted_node_eval(scene, origins, dirs, settings,
                                        jax.random.fold_in(key, 0))
        return surface

    if getattr(settings, "remat", True):
        body = jax.checkpoint(body)
    (_, _, _, acc), _ = jax.lax.scan(
        body, (origins, dirs, weights, acc0), jnp.arange(remaining + 1))
    return acc


@functools.lru_cache(maxsize=None)
def _compact_topw(W: int):
    """Top-W-rows-by-key compaction with a permutation-fixed VJP.

    Forward is the plain stable 8-operand lax.sort (a fixed compare-swap
    network over lanes — the fastest form measured). Reverse-mode AD of
    lax.sort itself scatters cotangents through the data-dependent
    permutation (~60 ms per level on TPU, 97% of the glass backward);
    here the permutation is treated as locally constant (exact a.e.,
    like argmin) and the backward routes each surviving row's cotangent
    to its source row with W x 2W selects — all elementwise.
    """

    @jax.custom_vjp
    def compact(keys, *ops):
        srt = jax.lax.sort((keys,) + ops, dimension=0, num_keys=1,
                           is_stable=True)
        return tuple(a[:W] for a in srt[1:])

    def fwd(keys, *ops):
        row = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 0)
        srt = jax.lax.sort((keys, row) + ops, dimension=0, num_keys=1,
                           is_stable=True)
        return tuple(a[:W] for a in srt[2:]), (srt[1][:W], keys.shape)

    def bwd(res, cts):
        perm, kshape = res
        grads = []
        for ct in cts:
            rows = []
            for j in range(2 * W):
                acc = jnp.zeros_like(ct[0])
                for i in range(W):
                    acc = jnp.where(perm[i] == j, ct[i], acc)
                rows.append(acc)
            grads.append(jnp.stack(rows, 0))
        return (jnp.zeros(kshape, cts[0].dtype),) + tuple(grads)

    compact.defvjp(fwd, bwd)
    return compact


def _color_at_compact_scan(scene: sd.SceneData, ro: V3, rd: V3,
                           remaining: int, settings: RenderSettings,
                           key) -> V3:
    """Whitted wavefront with per-pixel live-path compaction.

    The exhaustive level scan (`_color_at_sorted_scan`) pays the full
    W = 2^depth width at every level even though measured live-path
    counts collapse fast (glass scene: mean ~1 live path per pixel per
    level, p99.9 <= 10, vs the scan's fixed 32). Here the wavefront is
    pixel-major [W, R] with W = wavefront_capacity paths per pixel; one
    batched node evaluation per level, then the 2W children rows are
    stable-sorted along the path axis by descending weight (lax.sort
    dimension=0 — a fixed 2W-row network over lanes, the same primitive
    the slot machinery uses; no scatters, no cross-pixel traffic) and
    the top W rows survive. Zero-weight paths — the exact cutoff the
    reference recursion applies when reflective/transparency is 0 or the
    ray misses (scene.rs:281-290,310-336) — sort last, so dead work is
    dropped first. A level whose weights are ALL zero skips its node
    evaluation entirely via lax.cond (deep CSG/area scenes die after
    1-2 bounces; only the small per-level outputs cross the cond).

    A pixel loses a LIVE path only when it holds more than W nonzero-
    weight paths at one level, and then lowest-weight-first; the glass
    BASELINE scene needs W = 16 for bit-exactness (p100 = 13 live paths
    at depth 5), while the default W = 4 is visually exact (max |diff|
    ~1e-4 linear, ~3% of one u8 step — the dropped tails carry ~1e-3
    weights). wavefront_capacity = 2^depth reproduces the exhaustive
    scan exactly; the A/B tests pin both. Measured on TPU v5e at
    800x600: 61 Mrays/s vs the exhaustive scan's 8.8 (scan work is
    (depth+1)*2^depth*R = 192R; compact is (depth+1)*W*R = 24R plus a
    2W-row sort network per level).
    """
    R = ro.x.shape[0]
    dtype = ro.dtype
    W = min(max(int(getattr(settings, "wavefront_capacity", 4)), 2),
            2 ** remaining)

    # Narrow unrolled prefix: level L holds exactly 2^L live paths per
    # pixel, so while 2^(L+1) <= W the children fit capacity with a
    # static heap placement — no sort, no drops, and the node evaluates
    # 2^L*R rows instead of W*R (levels 0-1 at W=4 would otherwise waste
    # 3R + 2R node rows and two 2W-row sorts per tile; measured ~20% of
    # the glass frame). Capped at 2 unrolled node-graph copies — deeper
    # unrolls blow up the XLA graph the scan exists to avoid. Weights of
    # un-spawned rows are exact zeros, so results are unchanged (the
    # full-capacity A/B pins this).
    # All fresh constants derive from the ray arrays (x*0+fill) so their
    # varying-axis type matches the node outputs under shard_map.
    acc = (ro.x * 0.0,) * 3
    flat = (ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, ro.x * 0.0 + 1.0)
    width, start = 1, 0
    while start <= remaining and 2 * width <= W and start < 2:
        def prefix_level(flat, acc, level=start, width=width):
            ox, oy, oz, dx, dy, dz, wf = flat

            def live_fn(_):
                lk = jax.random.fold_in(key, level)
                surface, over, under, reflectv, refr_dir, refl_w, refr_w = \
                    _sorted_node_eval(scene, V3(ox, oy, oz), V3(dx, dy, dz),
                                      settings, lk)
                contrib = tuple((c * wf).reshape(width, R).sum(0)
                                for c in (surface.x, surface.y, surface.z))
                cat = lambda a, b: jnp.concatenate([a, b])
                return (cat(over.x, under.x), cat(over.y, under.y),
                        cat(over.z, under.z), cat(reflectv.x, refr_dir.x),
                        cat(reflectv.y, refr_dir.y),
                        cat(reflectv.z, refr_dir.z),
                        cat(wf * refl_w, wf * refr_w)), contrib

            def dead_fn(_):
                z = ox * 0.0
                dead = (z, z, z, z, z, z + 1.0, z)
                return tuple(jnp.concatenate([a, b])
                             for a, b in zip(dead, dead)), \
                    (z.reshape(width, R)[0],) * 3

            if level == 0:
                flat_n, contrib = live_fn(None)  # primaries always live
            else:
                # Same dead-level skip as the scan body: a tile whose
                # paths all died pays only the cond (CSG/area scenes die
                # after 1-2 bounces on most tiles).
                flat_n, contrib = jax.lax.cond(jnp.any(wf != 0.0),
                                               live_fn, dead_fn, None)
            return flat_n, tuple(a + c for a, c in zip(acc, contrib))

        if getattr(settings, "remat", True):
            prefix_level = jax.checkpoint(prefix_level)
        flat, acc = prefix_level(flat, acc)
        width *= 2
        start += 1

    def lift(c, fill):
        row = c.reshape(width, R)[:1] * 0.0 + fill
        pad = jnp.broadcast_to(row, (W - width, R))
        return jnp.concatenate([c.reshape(width, R), pad], 0)

    state = (lift(flat[0], 0.0), lift(flat[1], 0.0), lift(flat[2], 0.0),
             lift(flat[3], 0.0), lift(flat[4], 0.0), lift(flat[5], 1.0),
             lift(flat[6], 0.0))
    acc0 = acc
    if start > remaining:
        return V3(*acc)

    def body(carry, level):
        state, acc = carry
        w = state[6]
        lk = jax.random.fold_in(key, level)

        def live_fn(_):
            flat = lambda a: a.reshape(W * R)
            ox, oy, oz, dx, dy, dz, wf = (flat(a) for a in state)
            surface, over, under, reflectv, refr_dir, refl_w, refr_w = \
                _sorted_node_eval(scene, V3(ox, oy, oz), V3(dx, dy, dz),
                                  settings, lk)
            contrib = tuple((c * wf).reshape(W, R).sum(0)
                            for c in (surface.x, surface.y, surface.z))
            two = lambda a, b: jnp.concatenate(
                [a.reshape(W, R), b.reshape(W, R)], 0)
            cw = two(wf * refl_w, wf * refr_w)
            ops = (two(over.x, under.x), two(over.y, under.y),
                   two(over.z, under.z),
                   two(reflectv.x, refr_dir.x), two(reflectv.y, refr_dir.y),
                   two(reflectv.z, refr_dir.z), cw)
            keys = jax.lax.stop_gradient(-cw)
            return _compact_topw(W)(keys, *ops), contrib

        def dead_fn(_):
            return state, (state[0][0] * 0.0,) * 3

        state_n, contrib = jax.lax.cond(jnp.any(w != 0.0), live_fn, dead_fn,
                                        None)
        acc = tuple(a + c for a, c in zip(acc, contrib))
        return (state_n, acc), None

    if getattr(settings, "remat", True):
        body = jax.checkpoint(body)
    (_, acc), _ = jax.lax.scan(body, (state, acc0),
                               jnp.arange(start, remaining + 1))
    return V3(*acc)


def _color_at_sorted_unrolled(scene: sd.SceneData, ro: V3, rd: V3,
                              remaining: int, settings: RenderSettings,
                              key) -> V3:
    """Level-synchronous wavefront over the Whitted ray tree.

    Instead of unrolling the 2^(d+1)-1-node recursion (63 copies of the
    node graph at depth 5 — minutes of XLA compile), each depth level is
    ONE batched node evaluation over the concatenated child rays of the
    previous level, with per-ray scalar path weights. Total work equals
    the recursive tree exactly; graph size is depth+1 node copies.
    """
    R = ro.x.shape[0]
    acc = V3(jnp.zeros(R, ro.dtype), jnp.zeros(R, ro.dtype),
             jnp.zeros(R, ro.dtype))
    spawn_refr = scene.has_transparent
    spawn_refl = scene.has_reflective

    origins, dirs = ro, rd
    weights = jnp.ones(R, ro.dtype)
    for level in range(remaining + 1):
        lk = jax.random.fold_in(key, level)
        surface, over, under, reflectv, refr_dir, refl_w, refr_w = \
            _sorted_node_eval(scene, origins, dirs, settings, lk)
        contrib = surface * weights
        width = contrib.x.shape[0] // R
        acc = acc + V3(contrib.x.reshape(width, R).sum(0),
                       contrib.y.reshape(width, R).sum(0),
                       contrib.z.reshape(width, R).sum(0))
        if level == remaining:
            break
        if spawn_refl and spawn_refr:
            origins = _concat_v3(over, under)
            dirs = _concat_v3(reflectv, refr_dir)
            weights = jnp.concatenate([weights * refl_w, weights * refr_w])
        elif spawn_refl:
            origins, dirs = over, reflectv
            weights = weights * refl_w
        elif spawn_refr:
            origins, dirs = under, refr_dir
            weights = weights * refr_w
        else:
            break
    return acc


# ---------------------------------------------------------------------------
# Sorted path (CSG / refraction)
# ---------------------------------------------------------------------------

def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _reflect(v, n):
    return v - n * (2.0 * _dot(v, n))[:, None]


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)


def _schlick(eyev, normalv, n1, n2):
    """Fresnel approximation (computations.rs:39-54). 1e-30 sqrt floor:
    see _schlick_soa."""
    cos = _dot(eyev, normalv)
    n = n1 / n2
    sin2_t = n * n * (1.0 - cos * cos)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 1e-30))
    cos_eff = jnp.where(n1 > n2, cos_t, cos)
    r0 = ((n1 - n2) / (n1 + n2)) ** 2
    reflectance = r0 + (1.0 - r0) * (1.0 - cos_eff) ** 5
    tir = (n1 > n2) & (sin2_t > 1.0)
    return jnp.where(tir, 1.0, reflectance)


def _lighting(scene, prim, base_color, light, point, eyev, normalv,
              shadow_frac):
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
    """Point lights: binary; area lights: level^2 jittered-grid samples."""
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
    # Same point-keyed draws as the SoA path (ops/jitter.py) so the
    # AoS/SoA A/B stays exact on area scenes.
    sg = jax.lax.stop_gradient
    seed = jitter_mod.seed_from_key(key)
    rand = jnp.moveaxis(
        jitter_mod.point_jitter(seed, sg(over[:, 0]), sg(over[:, 1]),
                                sg(over[:, 2]), n, dtype=dtype), 0, -1)
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


def _color_at_sorted(scene: sd.SceneData, ro, rd, remaining: int,
                     settings: RenderSettings, key):
    """Sorted-prefix Whitted node (the unrolled ray tree, AoS arrays)."""
    dtype = ro.dtype
    eps = offset_eps(dtype)
    slots = hits_mod.gather_sorted_hits(scene, ro, rd, settings)
    found, hit_idx, t, prim, u, v = hits_mod.select_hit(slots)

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
        rc = _color_at_sorted(scene, over, reflectv, remaining - 1, settings,
                              jax.random.fold_in(key, 1))
        reflected = rc * reflective[:, None]

    if remaining > 0 and scene.has_transparent:
        n_ratio = n1 / n2
        cos_i = _dot(eyev, normalv)
        sin2_t = n_ratio * n_ratio * (1.0 - cos_i * cos_i)
        tir = sin2_t > 1.0
        cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 1e-30))
        direction = (normalv * (n_ratio * cos_i - cos_t)[:, None]
                     - eyev * n_ratio[:, None])
        live = found & ~tir & (transparency > 0.0)
        safe_dir = jnp.where(live[:, None], direction,
                             jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], dtype),
                                              direction.shape))
        rc = _color_at_sorted(scene, under, safe_dir, remaining - 1, settings,
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


def needs_sorted_path(scene: sd.SceneData) -> bool:
    return bool(scene.csg_ops) or scene.has_transparent


def _soa_node_fn(scene: sd.SceneData):
    """Pick the SoA integrator node for this scene."""
    if not needs_sorted_path(scene):
        return _color_at_soa
    return _color_at_sorted_soa


# Texture-completion cond granularity (rays per chunk): conds are
# ~free, so finer chunks fetch fewer texels for screen-local textures.
_COMPLETION_CH = 4096


def _xla_reference_node(scene, ro, rd, remaining, settings, key):
    """The pure-XLA Whitted evaluation for this scene (kernel-free).

    The fused kernel's custom-VJP backward recomputes through this, so
    kernel gradients ARE the XLA gradients."""
    if needs_sorted_path(scene):
        if (getattr(settings, "wavefront", "compact") == "compact"
                and remaining > 0 and scene.has_reflective
                and scene.has_transparent):
            return _color_at_compact_scan(scene, ro, rd, remaining,
                                          settings, key)
        return _color_at_sorted_scan(scene, ro, rd, remaining, settings,
                                     key)
    return _color_at_soa_xla(scene, ro, rd, remaining, settings, key)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _whitted_kernel_call(scene, rays, key, remaining, settings):
    """Fused Pallas Whitted evaluation (kernels/whitted.py).

    Forward runs the whole level scan in one kernel (state in VMEM,
    per-block dead-row skipping); the custom VJP's backward recomputes
    through the XLA node (`_xla_reference_node`) with the SAME key, so
    gradients ARE the XLA gradients — the kernel needs no AD rule of
    its own. `key` feeds only the per-(level, light) jitter-seed table
    (the XLA fold_in chain evaluated here, so the kernel's area-light
    draws are bit-identical to the XLA loop's)."""
    from ..kernels import whitted as kwhit

    prim_tbl = kwhit.pack_prims(scene)
    pat_tbl, descrs = kwhit.pack_patterns(scene)
    light_tbl = kwhit.pack_lights(scene)
    both = scene.has_reflective and scene.has_transparent
    depth = remaining if (scene.has_reflective or scene.has_transparent) \
        else 0
    W = min(max(int(getattr(settings, "wavefront_capacity", 4)), 2),
            2 ** remaining) if (both and remaining > 0) else 1
    L = len(scene.lights)
    seeds = jnp.stack([
        jnp.stack([jitter_mod.seed_from_key(
            jax.random.fold_in(jax.random.fold_in(key, lvl), 1000 + li))
            for li in range(L)])
        for lvl in range(depth + 1)])
    mesh = kwhit.mesh_meta(scene)
    tri_tbl = tri_boxes = None
    if mesh[0]:
        tri_tbl, tri_boxes = kwhit.pack_tris(scene)
    textured = kwhit.scene_textured(scene)
    outs = kwhit.whitted_compact(
        rays[:3], rays[3:], prim_tbl, pat_tbl, light_tbl, seeds,
        kinds=tuple(scene.prim_kinds), pat_descrs=descrs,
        prim_pat=tuple(scene.prim_pattern_static),
        lmeta=kwhit.light_meta(scene), depth=depth, W=W,
        has_refl=scene.has_reflective, has_refr=scene.has_transparent,
        tri_tbl=tri_tbl, tri_boxes=tri_boxes, mesh=mesh,
        csg=kwhit.csg_meta(scene), textured=textured,
        interpret=getattr(settings, "pallas", "off") == "interpret")
    if not textured:
        return outs
    # Affine texture completion: the kernel emits per-ray (multiplier
    # rgb, FLAT texel index — offset-partitioned across the scene's
    # textures, -1 for untextured rays); every pattern combinator and
    # the base-color Phong path are affine in the image leaf's value,
    # so adding texel * multiplier reproduces the XLA pattern_at
    # exactly (pattern.rs:209-213, texture.rs:32-54). The row-gather
    # runs per 4096-ray CHUNK under lax.cond — textures are
    # screen-local, and a whole-tile cond (103k rays) still fetched
    # ~2 ms of texels per 1080p frame for the torus's few percent of
    # pixels; swizzled block order (render() swizzles textured scenes)
    # keeps chunks spatially tight so most skip.
    from ..render import shade_soa

    def image_node(node):
        if node is None:
            return None
        if node.ptype == "image":
            return node
        return image_node(node.a) or image_node(node.b)

    # Offset partition in pack_patterns' walk order (pre-order per root).
    roots = []
    off = 0
    for root in scene.patterns:
        node = image_node(root)
        if node is None:
            continue
        n = int(node.texture.shape[0]) * int(node.texture.shape[1])
        roots.append((off, n, node))
        off += n
    r = outs[0]
    R = r.shape[0]
    CH = min(_COMPLETION_CH, R)
    padR = (-R) % CH

    # STATIC chunk unroll, not lax.map: a while-loop step costs ~µs of
    # dispatch, and 26 chunks x 20 tiles of that exceeded the gathers
    # it was saving (measured 332 M vs 369 M). Unrolled conds are free
    # when they don't fire; a tile-level cond around the whole pass
    # spares texture-free tiles even the pad/reshape/concat copies.
    def completion(_):
        arrs = [jnp.pad(a, (0, padR),
                        constant_values=(-1.0 if i == 6 else 0.0))
                if padR else a for i, a in enumerate(outs)]
        arrs = [a.reshape(-1, CH) for a in arrs]
        n_chunks = arrs[0].shape[0]
        out_rows = []
        for ci in range(n_chunks):
            cr, cg, cb, tmr, tmg, tmb, tidx = (a[ci] for a in arrs)
            for off, n, node in roots:
                m = (tidx >= float(off)) & (tidx < float(off + n))

                def fetch(_, node=node, tidx=tidx, off=off, n=n):
                    local = jnp.clip(tidx - float(off), 0.0,
                                     float(n - 1)).astype(jnp.int32)
                    tx = shade_soa._fetch_texel_flat(node.texture, local,
                                                     tidx.dtype)
                    return tx.x, tx.y, tx.z

                def skip(_, cr=cr):
                    z = jnp.zeros_like(cr)
                    return z, z, z

                tx, ty, tz = jax.lax.cond(jnp.any(m), fetch, skip, None)
                cr = cr + jnp.where(m, tx * tmr, 0.0)
                cg = cg + jnp.where(m, ty * tmg, 0.0)
                cb = cb + jnp.where(m, tz * tmb, 0.0)
            out_rows.append((cr, cg, cb))
        rr = jnp.concatenate([t[0] for t in out_rows])
        gg = jnp.concatenate([t[1] for t in out_rows])
        bb = jnp.concatenate([t[2] for t in out_rows])
        return rr[:R], gg[:R], bb[:R]

    return jax.lax.cond(jnp.any(outs[6] >= 0.0), completion,
                        lambda _: (outs[0], outs[1], outs[2]), None)


def _whitted_kernel_fwd(scene, rays, key, remaining, settings):
    return _whitted_kernel_call(scene, rays, key, remaining, settings), \
        (scene, rays, key)


def _whitted_kernel_bwd(remaining, settings, res, cts):
    import numpy as np

    scene, rays, key = res

    def xla_fn(scene, rays):
        out = _xla_reference_node(scene, V3(*rays[:3]), V3(*rays[3:]),
                                  remaining, settings, key)
        return (out.x, out.y, out.z)

    _, vjp = jax.vjp(xla_fn, scene, rays)
    d_scene, d_rays = vjp(cts)
    d_key = jax.tree_util.tree_map(
        lambda x: np.zeros(jnp.shape(x), jax.dtypes.float0), key)
    return d_scene, d_rays, d_key


_whitted_kernel_call.defvjp(_whitted_kernel_fwd, _whitted_kernel_bwd)


def _color_at_sorted_soa(scene: sd.SceneData, ro: V3, rd: V3, remaining: int,
                         settings: RenderSettings, key) -> V3:
    """Sorted-path dispatcher. Default "compact": capacity-bounded
    wavefront with per-level live-ray compaction when both reflection
    and refraction spawn (the level scan pays the full 2^d width every
    level), else the width-1 chain scan. On TPU, analytic point-light
    scenes run the compact wavefront as ONE fused Pallas kernel
    (kernels/whitted.py — state in VMEM, per-block dead-row skipping;
    measured 72 -> see README on the glass BASELINE). "scan" forces the
    exhaustive level-synchronous wavefront; "unrolled" compiles one
    body per level (exact tree work, CPU parity A/B only — the remote
    TPU compiler chokes on it)."""
    impl = getattr(settings, "wavefront", "compact")
    if impl == "unrolled":
        return _color_at_sorted_unrolled(scene, ro, rd, remaining, settings,
                                         key)
    if impl == "compact":
        from ..kernels import whitted as kwhit
        if kwhit.applicable(scene, settings, ro.dtype):
            outs = _whitted_kernel_call(
                scene, (ro.x, ro.y, ro.z, rd.x, rd.y, rd.z), key,
                remaining, settings)
            return V3(*outs)
        if (remaining > 0 and scene.has_reflective
                and scene.has_transparent):
            return _color_at_compact_scan(scene, ro, rd, remaining,
                                          settings, key)
    return _color_at_sorted_scan(scene, ro, rd, remaining, settings, key)


def color_at(scene: sd.SceneData, ro, rd, remaining: int,
             settings: RenderSettings, key):
    """Color seen along rays; accepts [R,3] arrays (public API)."""
    scene = sd.canonicalize(scene)
    node = _soa_node_fn(scene)
    out = node(scene, V3(ro[:, 0], ro[:, 1], ro[:, 2]),
               V3(rd[:, 0], rd[:, 1], rd[:, 2]), remaining, settings, key)
    return out.to_array()


def _tile_rays(scene: sd.SceneData, cam: CameraData,
               settings: RenderSettings) -> int:
    """Rays per device step, capped so [R, C] triangle intermediates (and
    their area-light-sample multiples) stay within max_rc_elems."""
    rows = settings.rows_per_tile
    if scene.has_transparent and scene.has_reflective:
        if getattr(settings, "wavefront", "compact") == "compact":
            # Compact-wavefront node evals are W*R rays wide (W = per-
            # pixel capacity) and CSG scenes additionally carry
            # [max_hits, W*R] slot buffers; bound the biggest buffer at
            # max_rc_elems f32 elements (the TPU worker faults outright
            # on multi-100MB buffers).
            cap = min(max(int(getattr(settings, "wavefront_capacity", 4)),
                          2), 2 ** settings.depth)
            per_ray = cap * (settings.max_hits if scene.csg_ops else 8)
            max_rays = max(settings.max_rc_elems // per_ray, 1)
        else:
            # The scan wavefront widens to 2^depth x rays at every level,
            # and each widened ray carries [K, R] sort buffers — keep the
            # widened batch well under HBM (observed device crashes at
            # ~15M rays).
            max_rays = max(settings.max_rc_elems
                           // (8 * 2 ** settings.depth), 1)
        rows = min(rows, max(max_rays // cam.hsize, 1))
    T = scene.counts[6]
    mesh_in_csg = bool(scene.csg_ops) and not soa.csg_members_analytic(scene)
    if T and (mesh_in_csg or not soa._use_pallas(settings, cam.inv.dtype)):
        # Shadow sampling runs one area-light sample per scan step at [R]
        # width, so the bound is the [R, chunk] triangle intermediate
        # alone (the old [samples*R] shadow batch is gone). The Pallas
        # kernels keep the ray/triangle products in VMEM — no [R, chunk]
        # HBM intermediate exists — but a mesh inside a CSG still routes
        # through sorted_slots_full_soa/any_hit_sorted_soa, whose XLA
        # [R, chunk] HBM intermediates need the cap even with Pallas on.
        chunk = min(settings.tri_chunk, T)
        # Area-light shadow tests run `level` samples per scan step, so
        # their [g*R, chunk] triangle intermediate is g x bigger.
        g = max([light.level for light in scene.lights
                 if light.kind == "area"] or [1])
        max_rays = max(settings.max_rc_elems // (chunk * g), 1)
        rows = min(rows, max(max_rays // cam.hsize, 1))
    if any(shade_soa._has_image(p) for p in scene.patterns):
        # The packed-texture fetch materializes a [R, 128] u32 row-gather
        # intermediate (shade_soa._sample_texture); bound it like the
        # triangle intermediates so big tiles can't fault the worker.
        max_rays = max(settings.max_rc_elems // 128, 1)
        rows = min(rows, max(max_rays // cam.hsize, 1))
    return max(rows * cam.hsize, 1)


# Pixel-tile swizzle for mesh scenes: the triangle kernels cull a whole
# 512-ray block against chunk/node AABBs, so a block must be a compact
# screen region. In scanline order a block is a 512-pixel strip that
# crosses nearly every mesh's box; rendering in (16 x 32)-pixel tile
# order makes culling effective (measured 2x+ on the teapot frame).
# Pure reshape/transpose on both ends — no gathers, bit-identical image.
_SWZ_TH, _SWZ_TW = 16, 32


def _swizzled_rays(cam: CameraData):
    """SoA rays in (16 x 32)-tile-major order over the padded raster.

    Returns (ro, rd, Hp, Wp); pad pixels re-trace the last real pixel of
    their row/column and are cropped by `_unswizzle_image`."""
    th, tw = _SWZ_TH, _SWZ_TW
    Hp = -(-cam.vsize // th) * th
    Wp = -(-cam.hsize // tw) * tw
    ys, xs = jnp.meshgrid(jnp.arange(Hp), jnp.arange(Wp), indexing="ij")
    xs = jnp.minimum(xs, cam.hsize - 1)
    ys = jnp.minimum(ys, cam.vsize - 1)

    def sw(a):
        return a.reshape(Hp // th, th, Wp // tw, tw).swapaxes(1, 2).reshape(-1)

    ro, rd = rays_for_pixels_soa(cam, sw(xs), sw(ys))
    return ro, rd, Hp, Wp


def _unswizzle_image(colors, vsize, hsize, Hp, Wp):
    th, tw = _SWZ_TH, _SWZ_TW
    img = colors.reshape(Hp // th, Wp // tw, th, tw, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(Hp, Wp, 3)
    return img[:vsize, :hsize]


@functools.partial(jax.jit, static_argnames=("remaining", "settings"))
def _tile_eval(scene, ro, rd, remaining, settings, key):
    """One compiled tile evaluation (cached on scene structure/settings).

    Single-tile frames used to evaluate the node graph op-by-op while
    multi-tile frames compiled it under lax.map. Compiled execution
    contracts mul+add chains into FMAs, which flips f32 boundary
    decisions (shadow grazing hits, n1/n2 crossing matches) on ~1% of
    pixels relative to eager — so the same scene could render slightly
    differently depending on tile count, and wavefront A/B tests only
    agreed when both paths compiled identically. Always compiling keeps
    results a function of the scene, not the batching (and is faster)."""
    # Single source of truth: re-derive the duplicated tables (per-type
    # affines, cls_table) from the canonical leaves so gradient mass is
    # path-invariant and a trained scene cannot desync its copies.
    scene = sd.canonicalize(scene)
    return _soa_node_fn(scene)(scene, ro, rd, remaining, settings, key)


def render(scene: sd.SceneData, cam: CameraData,
           settings: RenderSettings = RenderSettings(), seed: int = 0):
    """Full-frame render -> image [vsize, hsize, 3] (linear, unclamped)."""
    key = jax.random.PRNGKey(seed)
    # Swizzled (16x32 pixel-block) tile order serves two locality needs:
    # the triangle kernels cull whole 512-ray blocks against AABBs, and
    # the bounce loops' dead-level/dead-row skipping (lax.cond per tile,
    # pl.when per kernel block) only fires when a whole region's paths
    # died — scanline tiles are full-width bands that almost always
    # cross some reflective/transparent object, while block-compact
    # tiles localize the live region. Pure relayout on both ends:
    # per-pixel values are identical, INCLUDING area-light jitter,
    # which is keyed by the shadow origin's bits (ops/jitter.py), not
    # the tile layout.
    from ..kernels import whitted as kwhit
    swizzle = (bool(scene.counts[6]) and soa._use_pallas(settings,
                                                         cam.inv.dtype)) \
        or scene.has_reflective or scene.has_transparent \
        or (kwhit.scene_textured(scene)
            and soa._use_pallas(settings, cam.inv.dtype))
    tile = _tile_rays(scene, cam, settings)
    if swizzle:
        ro, rd, Hp, Wp = _swizzled_rays(cam)
        R = Hp * Wp
        # Whole 512-ray blocks per device step keep tiles block-aligned;
        # split the frame evenly so the last tile isn't mostly padding.
        blk = _SWZ_TH * _SWZ_TW
        n_t = max(-(-R // max(tile, 1)), 1)
        tile = -(-(-(-R // n_t)) // blk) * blk
    else:
        R = cam.hsize * cam.vsize
        ro, rd = all_rays_soa(cam)
    pad = (-R) % tile
    if pad:
        padc = lambda c, f: jnp.concatenate(
            [c, jnp.full((pad,), f, c.dtype)], 0)
        ro = V3(padc(ro.x, 0.0), padc(ro.y, 0.0), padc(ro.z, 0.0))
        rd = V3(padc(rd.x, 0.0), padc(rd.y, 0.0), padc(rd.z, 1.0))
    n_tiles = (R + pad) // tile
    resh = lambda v: V3(v.x.reshape(n_tiles, tile),
                        v.y.reshape(n_tiles, tile),
                        v.z.reshape(n_tiles, tile))
    ro_t, rd_t = resh(ro), resh(rd)

    def tile_fn(args):
        o, d = args
        return _tile_eval(scene, o, d, settings.depth, settings, key)

    if n_tiles == 1:
        out = tile_fn((V3(ro_t.x[0], ro_t.y[0], ro_t.z[0]),
                       V3(rd_t.x[0], rd_t.y[0], rd_t.z[0])))
        colors = out.to_array()[:R]
    else:
        out = jax.lax.map(tile_fn, (ro_t, rd_t))
        colors = out.to_array().reshape(-1, 3)[:R]
    if swizzle:
        return _unswizzle_image(colors, cam.vsize, cam.hsize, Hp, Wp)
    return colors.reshape(cam.vsize, cam.hsize, 3)


def render_jit(scene, cam, settings: RenderSettings = RenderSettings(),
               seed: int = 0):
    fn = jax.jit(render, static_argnames=("settings", "seed"))
    return fn(scene, cam, settings=settings, seed=seed)
