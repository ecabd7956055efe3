"""Pallas TPU kernel: the ENTIRE compact Whitted wavefront, fused.

The XLA compact wavefront (render/integrator.py:_color_at_compact_scan)
evaluates one batched node per depth level; each node is ~30 elementwise
passes over [W*R] HBM buffers (hit slots, shadow predicates, n1/n2
crossing folds, Phong, Schlick, the 2W-row compaction sort), and
ablation on the glass BASELINE frame showed no single dominator — the
frame is bound by HBM round trips between fusions plus per-level fixed
costs (72 Mrays/s; removing the sort, shadows, and n1/n2 TOGETHER only
reached 115M). This kernel runs the WHOLE level scan per 512-ray block
with the wavefront state resident in VMEM:

* state [7, W, BR] (origin, direction, weight) never touches HBM;
* each level evaluates W per-pixel path rows; a row whose weights are
  all zero in this block is SKIPPED with `pl.when` — blocks are
  swizzled 16x32 pixel tiles, so live paths localize and deep levels
  typically run 1-2 rows instead of W (the XLA path can only skip at
  whole-tile = 120k-ray granularity);
* children are compacted per pixel by an odd-even transposition
  network over the 2W child rows (strict compare => stable, matching
  lax.sort's tie order in the XLA path);
* prim affines/materials and pattern-tree coefficients are SMEM
  scalars; slot formulas are ops/soa.py's, traced verbatim (the same
  reuse kernels/analytic.py relies on), so intersection quirks cannot
  drift from the reference semantics they pin (sphere.rs:64-78,
  plane.rs:51-58, cube.rs:48-77, cylinder.rs:94-136, cone.rs:134-141,
  scene.rs:159-336, light.rs:98-140, computations.rs:39-54).

Applicability (`applicable()`): analytic prims in OCCLUSION_KINDS, no
CSG / mesh / torus, point lights only, cheap pattern trees (no texture
gathers or Perlin). Everything else falls back to the XLA wavefront.
The caller wraps the kernel in a custom VJP whose backward recomputes
through the XLA path, so gradients are exactly the XLA gradients.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EPSILON
from ..ops.vec import V3
from ..scene import data as sd
from .analytic import OCCLUSION_KINDS, _occludes

BR = 512   # lanes per block (one swizzled 16x32 pixel tile)
SUB = 8    # sublanes per program: 8 blocks -> full (8, 128) vregs
_INF = float("inf")
_FAR = 1e30  # mesh-padding sentinel (matches kernels/triangles.py)
# f32 over/under offset (config.offset_eps) and the n1/n2 hit-match
# tolerance (ops/soa.py refractive_indices_direct), inlined as constants
# — the kernel is f32-only.
_EPS_OFF = 1e-3
_TOL = 1e-4

CHEAP_PATTERNS = ("solid", "stripe", "gradient", "ring", "checker", "blend")
# Fusable pattern node types: the cheap combinators plus in-kernel Perlin
# (noise/perturbed — ops/noise.py is pure int32/f32 math that Mosaic
# lowers) and image leaves (sampled OUTSIDE the kernel via the affine
# texture-completion contract — see `textured` in whitted_compact).
KERNEL_PATTERNS = CHEAP_PATTERNS + ("noise", "perturbed", "image")


def _tree_cheap(node) -> bool:
    if node is None:
        return True
    return node.ptype in CHEAP_PATTERNS and _tree_cheap(node.a) \
        and _tree_cheap(node.b)


def _tree_fusable(node) -> bool:
    if node is None:
        return True
    return node.ptype in KERNEL_PATTERNS and _tree_fusable(node.a) \
        and _tree_fusable(node.b)


def _n_images(node) -> int:
    if node is None:
        return 0
    return int(node.ptype == "image") + _n_images(node.a) + _n_images(node.b)


def scene_textured(scene) -> bool:
    """Does any pattern tree hold an image leaf? (static)"""
    return any(_n_images(p) for p in scene.patterns)


def applicable(scene, settings, dtype) -> bool:
    """Can this scene's Whitted evaluation run as the fused kernel?

    Covers the fast path (no CSG/transparency — width-1 reflection
    chain), the transparency chain, and the compact wavefront; point
    AND area lights (area jitter is the point-keyed hash of
    ops/jitter.py, recomputed in-register); triangle meshes on the
    depth-0 point-light path (scalar-broadcast Möller–Trumbore over an
    SMEM table — see MESH_MAX_TRIS for the budget and the gating
    rationale); tori (Mosaic-safe quartic, soa._torus_slots_nocond);
    CSG over analytic members (the static pairwise-parity filter of
    soa.csg_keeps, traced in-register); and Perlin noise / perturbed
    patterns. Image patterns fuse on the depth-0 path only: the kernel
    emits (u, v, pattern root, multiplier) per ray and the caller adds
    `texel * multiplier` — exact because every pattern combinator and
    the Phong base-color path are affine in the image leaf's value."""
    from ..ops import soa

    if scene.csg_ops and (not soa.csg_members_analytic(scene)
                          or scene.has_transparent):
        # Mesh-in-CSG needs the full sorted slot list; CSG +
        # transparency needs the FILTERED slots in the n1/n2 walk —
        # both are sorted-path semantics the kernel doesn't carry.
        return False
    if not soa._use_pallas(settings, dtype):
        return False
    if scene.counts[6]:
        # Mesh gating: the SMEM table bounds T, and the refraction
        # n1/n2 crossing folds would need every mesh slot — so no
        # transparency. Reflection chains (width-1: the mesh fold +
        # shadows replicate per level under the static level loop) and
        # area lights (the mesh any-hit runs per shadow sample, gated
        # per chunk by pl.when) fuse as of round 5.
        if scene.counts[6] > MESH_MAX_TRIS:
            return False
        if scene.has_transparent:
            return False
        if len(_tri_groups(scene)[1]) > 8:
            return False  # material/pattern selects unroll per group
    if not all(k in OCCLUSION_KINDS or k in (sd.TRIANGLE, sd.TORUS)
               for k in scene.prim_kinds):
        return False
    n_analytic = sum(k != sd.TRIANGLE for k in scene.prim_kinds)
    if len(scene.prim_kinds) == 0 or n_analytic > 16:
        return False
    if not all(light.kind in ("point", "area") for light in scene.lights):
        return False
    if not all(_tree_fusable(p) for p in scene.patterns):
        return False
    if scene_textured(scene):
        # Texture completion is wired for the single-node (depth-0)
        # case; one image leaf per tree keeps the (u, v, root) contract
        # one-slot; textured meshes would need in-kernel barycentric uv.
        if scene.has_reflective or scene.has_transparent:
            return False
        if any(_n_images(p) > 1 for p in scene.patterns):
            return False
        if _total_texels(scene) >= (1 << 24):
            return False  # flat texel indices must be exact in f32
        for pid, kind in enumerate(scene.prim_kinds):
            pat = scene.prim_pattern_static[pid]
            if kind == sd.TRIANGLE and pat < len(scene.patterns) \
                    and _n_images(scene.patterns[pat]):
                return False
    return True


# ---------------------------------------------------------------------------
# Host-side packing: per-prim params, pattern trees, lights.
# ---------------------------------------------------------------------------

# Per-prim SMEM row layout (f32):
#  0-11  world->object affine [3,4]
# 12-20  normal matrix [3,3] (object normal -> world, unnormalized)
# 21     ymin   22 ymax   23 closed
# 24 ambient  25 diffuse  26 specular  27 shininess
# 28 reflective  29 transparency  30 ior   31 torus minor radius
P_COLS = 32


def pack_prims(scene):
    """[P, 32] f32 prim table from the class shade table (identical
    values to what the XLA ClassReader selects)."""
    tbl = scene.cls_table.astype(jnp.float32)
    rows = []
    for pid in range(len(scene.prim_kinds)):
        ci = scene.prim_class_static[pid]
        r = tbl[ci]
        rows.append(jnp.concatenate([
            r[sd.CLS_INV:sd.CLS_INV + 12],
            r[sd.CLS_NMAT:sd.CLS_NMAT + 9],
            r[sd.CLS_PMIN:sd.CLS_PMIN + 1],
            r[sd.CLS_PMAX:sd.CLS_PMAX + 1],
            r[sd.CLS_CLOSED:sd.CLS_CLOSED + 1],
            r[sd.CLS_AMBIENT:sd.CLS_AMBIENT + 1],
            r[sd.CLS_DIFFUSE:sd.CLS_DIFFUSE + 1],
            r[sd.CLS_SPECULAR:sd.CLS_SPECULAR + 1],
            r[sd.CLS_SHININESS:sd.CLS_SHININESS + 1],
            r[sd.CLS_REFLECTIVE:sd.CLS_REFLECTIVE + 1],
            r[sd.CLS_TRANSPARENCY:sd.CLS_TRANSPARENCY + 1],
            r[sd.CLS_IOR:sd.CLS_IOR + 1],
            r[sd.CLS_TORR:sd.CLS_TORR + 1],
        ]))
    return jnp.stack(rows)


def pack_patterns(scene):
    """Flatten every fusable pattern tree into one [N, 17] f32 table
    plus static per-root descriptors (ptype, row, meta, a_descr,
    b_descr). `meta` is the octave count for noise/perturbed nodes and
    the (H, W, texel_offset) triple for image leaves — offsets
    partition one flat texel-index space across every image in the
    scene, so the kernel emits ONE f32 index channel (exact below 2^24)
    instead of (u, v, root) triples.

    Node row layout: 0-11 inv affine [3,4], 12-14 color, 15 scale,
    16 persistence."""
    rows = []
    descrs = []
    tex_off = [0]

    def walk(node):
        if node is None:
            return None
        idx = len(rows)
        rows.append(jnp.concatenate([
            node.inv.reshape(12).astype(jnp.float32),
            node.color.reshape(3).astype(jnp.float32),
            jnp.asarray(node.scale, jnp.float32).reshape(1),
            jnp.asarray(node.persistence, jnp.float32).reshape(1),
        ]))
        if node.ptype == "image":
            h, w = int(node.texture.shape[0]), int(node.texture.shape[1])
            meta = (h, w, tex_off[0])
            tex_off[0] += h * w
        else:
            meta = int(node.octaves)
        return (node.ptype, idx, meta, walk(node.a), walk(node.b))

    for root in scene.patterns:
        descrs.append(walk(root))
    return jnp.stack(rows), tuple(descrs)


def _total_texels(scene) -> int:
    total = 0

    def walk(node):
        nonlocal total
        if node is None:
            return
        if node.ptype == "image":
            total += int(node.texture.shape[0]) * int(node.texture.shape[1])
        walk(node.a)
        walk(node.b)

    for root in scene.patterns:
        walk(root)
    return total


def csg_meta(scene):
    """Static CSG descriptor: (per-prim member flags, innermost-first
    (op, per-prim side tuple) list) — feeds soa.csg_keeps in-kernel."""
    if not scene.csg_ops:
        return ((), ())
    return (tuple(scene.csg_member_static),
            tuple((op, tuple(scene.csg_side_static[ci]))
                  for ci, op in enumerate(scene.csg_ops)))


def pack_lights(scene):
    """[L, 15] f32: position(3), intensity(3), corner(3), uvec(3),
    vvec(3); the area extras are zeros for point lights."""
    z3 = jnp.zeros((3,), jnp.float32)
    rows = []
    for light in scene.lights:
        area = light.kind == "area"
        rows.append(jnp.concatenate([
            light.position.astype(jnp.float32).reshape(3),
            light.intensity.astype(jnp.float32).reshape(3),
            light.corner.astype(jnp.float32).reshape(3) if area else z3,
            light.uvec.astype(jnp.float32).reshape(3) if area else z3,
            light.vvec.astype(jnp.float32).reshape(3) if area else z3,
        ]))
    return jnp.stack(rows)


def light_meta(scene):
    """Static per-light (kind, level) tuple."""
    return tuple((light.kind, int(light.level) if light.kind == "area"
                  else 0) for light in scene.lights)


# Mesh fusion budget/granularity. The triangle table is SMEM ([T, 19]
# f32 = 76 B/tri; 1024 tris = 78 KB, same scale as the BVH kernel's
# 96 KB node-box table) and the per-triangle fold is UNROLLED, so T
# bounds both scalar memory and Mosaic compile size. MESH_CHUNK is the
# cull granularity: a chunk whose AABB no ray in the (8, 512) block
# enters before its current best t is skipped whole under pl.when.
# Finer chunks looked attractive but measured badly in the standalone
# kernel (chunk 8 was 2.7x SLOWER than 48 on the teapot frame — the
# per-chunk slab + branch fixed cost dominates); at 24 the chunk body
# (~77 ops x 24 tris) outweighs the ~25-op cull by 70x, so the
# granularity is safe here.
MESH_MAX_TRIS = 1024
MESH_CHUNK = 24

# SMEM triangle row layout (f32, world space — mesh transforms are
# folded into the vertex tables at scene compile):
#  0-2 p1   3-5 e1   6-8 e2   9-17 n1 n2 n3 (unnormalized vertex
# normals; flat triangles store n1=n2=n3)   18 material-group id
# (every triangle is its OWN prim in the flat tables, so materials /
# patterns select by the static (shade class, pattern) group instead —
# a handful of groups per scene vs hundreds of triangle prims).
T_COLS = 19


def _tri_groups(scene):
    """Static (class, pattern) grouping of the triangle prims ->
    (per-prim gid list, tuple of representative prim ids per group)."""
    prim_gid = [0] * len(scene.prim_kinds)
    key_to_gid = {}
    reps = []
    for i, k in enumerate(scene.prim_kinds):
        if k != sd.TRIANGLE:
            continue
        key = (scene.prim_class_static[i], scene.prim_pattern_static[i])
        if key not in key_to_gid:
            key_to_gid[key] = len(reps)
            reps.append(i)
        prim_gid[i] = key_to_gid[key]
    return prim_gid, tuple(reps)


def pack_tris(scene):
    """([Tp, 19] f32 SMEM triangle table, [6, n_chunks + 1] f32 chunk
    AABBs — last column is the whole-mesh box) for the in-kernel fold.

    Triangles keep their Morton order (scene/data.py), so MESH_CHUNK
    runs are spatially tight. Padding rows carry p1 = _FAR with zero
    edges (degenerate: det == 0 kills them) and are masked out of the
    chunk boxes."""
    T = scene.counts[6]
    pad = (-T) % MESH_CHUNK
    Tp = T + pad

    def padt(col, fill=0.0):
        col = col.astype(jnp.float32)
        return jnp.pad(col, (0, pad), constant_values=fill) if pad else col

    cols = []
    for k, tbl in enumerate((scene.tri_p1, scene.tri_e1, scene.tri_e2,
                             scene.tri_n1, scene.tri_n2, scene.tri_n3)):
        for j in range(3):
            cols.append(padt(tbl[:, j], fill=(_FAR if k == 0 else 0.0)))
    prim_gid, _ = _tri_groups(scene)
    gid = jnp.take(jnp.asarray(prim_gid, jnp.float32), scene.tri_prim)
    cols.append(padt(gid))
    tbl = jnp.stack(cols, axis=1)

    n_chunks = Tp // MESH_CHUNK
    live = (jnp.arange(Tp) < T).reshape(n_chunks, MESH_CHUNK)
    lo, hi = [], []
    for j in range(3):
        v1 = cols[j].reshape(n_chunks, MESH_CHUNK)
        v2 = v1 + cols[3 + j].reshape(n_chunks, MESH_CHUNK)
        v3 = v1 + cols[6 + j].reshape(n_chunks, MESH_CHUNK)
        mn = jnp.where(live, jnp.minimum(jnp.minimum(v1, v2), v3), _INF)
        mx = jnp.where(live, jnp.maximum(jnp.maximum(v1, v2), v3), -_INF)
        lo.append(mn.min(axis=1))
        hi.append(mx.max(axis=1))
    boxes = jnp.stack([lo[0], lo[1], lo[2], hi[0], hi[1], hi[2]], axis=0)
    whole = jnp.concatenate([boxes[:3].min(axis=1), boxes[3:].max(axis=1)])
    return tbl, jnp.concatenate([boxes, whole[:, None]], axis=1)


def mesh_meta(scene):
    """Static mesh descriptor: (padded tri count, representative prim
    id per material group — see _tri_groups)."""
    T = scene.counts[6]
    if not T:
        return (0, ())
    Tp = T + ((-T) % MESH_CHUNK)
    _, reps = _tri_groups(scene)
    return (Tp, reps)


# ---------------------------------------------------------------------------
# In-kernel building blocks (all [BR]-lane vector math, SMEM scalars).
# ---------------------------------------------------------------------------

def _affine_pt(p, base, v: V3) -> V3:
    g = lambda k: p(base + k)
    return V3(g(0) * v.x + g(1) * v.y + g(2) * v.z + g(3),
              g(4) * v.x + g(5) * v.y + g(6) * v.z + g(7),
              g(8) * v.x + g(9) * v.y + g(10) * v.z + g(11))


def _affine_vec(p, base, v: V3) -> V3:
    g = lambda k: p(base + k)
    return V3(g(0) * v.x + g(1) * v.y + g(2) * v.z,
              g(4) * v.x + g(5) * v.y + g(6) * v.z,
              g(8) * v.x + g(9) * v.y + g(10) * v.z)


def _nmat_vec(p, v: V3) -> V3:
    g = lambda k: p(12 + k)
    return V3(g(0) * v.x + g(1) * v.y + g(2) * v.z,
              g(3) * v.x + g(4) * v.y + g(5) * v.z,
              g(6) * v.x + g(7) * v.y + g(8) * v.z)


def _prim_slots(kind, p, o: V3, d: V3):
    """This prim's hit slots on the OBJECT-space ray (ops/soa.py forms,
    traced verbatim so local_intersect quirks cannot drift; the torus
    uses the cond-free Mosaic-safe quartic)."""
    from ..ops import soa
    if kind == sd.SPHERE:
        return soa._sphere_slots(o, d)
    if kind == sd.PLANE:
        return soa._plane_slots(o, d)
    if kind == sd.CUBE:
        return soa._cube_slots(o, d)
    if kind == sd.CYLINDER:
        return soa._cylinder_slots(o, d, p(21), p(22), p(23) != 0.0)
    if kind == sd.CONE:
        return soa._cone_slots(o, d, p(21), p(22), p(23) != 0.0)
    if kind == sd.TORUS:
        return soa._torus_slots_nocond(o, d, p(31))
    raise AssertionError(kind)  # pragma: no cover — applicable() gates


def _local_normal(kind, p, lp: V3) -> V3:
    """Per-kind local normal (shade_soa.normal_at formulas)."""
    x, y, z = lp.x, lp.y, lp.z
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    if kind == sd.SPHERE:
        return lp
    if kind == sd.PLANE:
        return V3(zero, one, zero)
    if kind == sd.CUBE:
        ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
        maxc = jnp.maximum(ax, jnp.maximum(ay, az))
        return V3(jnp.where(maxc == ax, x, zero),
                  jnp.where((maxc != ax) & (maxc == ay), y, zero),
                  jnp.where((maxc != ax) & (maxc != ay), z, zero))
    if kind == sd.TORUS:
        r = p(31)
        ss = x * x + y * y + z * z
        ps = 1.0 + r * r
        return V3(4.0 * x * (ss - ps), 4.0 * y * (ss - ps),
                  4.0 * z * (ss - ps + 2.0))
    cmin, cmax = p(21), p(22)
    dist = x * x + z * z
    top = (dist < 1.0) & (y >= cmax - EPSILON)
    bot = (dist < 1.0) & (y <= cmin + EPSILON)
    if kind == sd.CYLINDER:
        side_y = zero
    else:  # cone
        ny = jnp.sqrt(jnp.maximum(dist, 0.0))
        side_y = jnp.where(y > 0.0, -ny, ny)
    return V3(jnp.where(top | bot, zero, x),
              jnp.where(top, one, jnp.where(bot, -one, side_y)),
              jnp.where(top | bot, zero, z))


def _uv_kind(kind, p, pts: V3):
    """The winner kind's uv_mapping on pattern-space points
    (shade_soa.uv_at formulas; kmath supplies Mosaic-safe atan2/acos).
    `kind` is STATIC — pattern trees are per-prim, so the image leaf's
    uv is evaluated under a known shape kind."""
    from ..ops import kmath
    x, y, z = pts.x, pts.y, pts.z
    pi = jnp.pi
    if kind == sd.SPHERE:
        theta = kmath.atan2(z, x)
        rr = jnp.sqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
        phi = kmath.arccos(jnp.clip(y / rr, -1.0, 1.0))
        return (theta + pi) / (2.0 * pi), 1.0 - phi / pi
    if kind == sd.PLANE:
        return jnp.mod(x, 1.0), jnp.mod(z, 1.0)
    if kind == sd.CUBE:
        ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
        fx = (ax >= ay) & (ax >= az)
        fy = ~fx & (ay >= ax) & (ay >= az)
        ur = jnp.where(x > 0, (z + 1.0) * 0.5, (1.0 - z) * 0.5)
        uy = (x + 1.0) * 0.5
        vy = jnp.where(y > 0, (1.0 - z) * 0.5, (z + 1.0) * 0.5)
        uz = jnp.where(z > 0, (x + 1.0) * 0.5, (1.0 - x) * 0.5)
        uu = jnp.where(fx, ur, jnp.where(fy, uy, uz))
        vv = jnp.where(fy, vy, (y + 1.0) * 0.5)
        return uu, vv
    if kind == sd.CYLINDER:
        cmin, cmax = p(21), p(22)
        cap = (p(23) != 0.0) & ((y <= cmin) | (y >= cmax))
        theta = kmath.atan2(z, x)
        uu = jnp.where(cap, (x + 1.0) / 2.0, (theta + pi) / (2.0 * pi))
        vv = jnp.where(cap, (z + 1.0) / 2.0, jnp.mod(y, 1.0))
        return uu, vv
    if kind == sd.CONE:
        cmin, cmax = p(21), p(22)
        cap = (p(23) != 0.0) & ((jnp.abs(y - cmin) <= EPSILON)
                                | (jnp.abs(y - cmax) <= EPSILON))
        radius = jnp.maximum(jnp.abs(y), 1e-30)
        theta = (kmath.atan2(z, x) + pi) / (2.0 * pi)
        height = jnp.where(jnp.abs(cmax - cmin) < 1e-30, 1e-30,
                           cmax - cmin)
        uu = jnp.where(cap, (x / radius + 1.0) / 2.0, (y - cmin) / height)
        vv = jnp.where(cap, (z / radius + 1.0) / 2.0, theta)
        return uu, vv
    # torus (torus.rs:150-161)
    uu = (kmath.atan2(y, x) + pi) / (2.0 * pi)
    dist = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-30)) - 1.0
    vv = (kmath.atan2(z, dist) + pi) / (2.0 * pi)
    return uu, vv


def _descr_has_image(descr) -> bool:
    if descr is None:
        return False
    return descr[0] == "image" or _descr_has_image(descr[3]) \
        or _descr_has_image(descr[4])


def _descr_expensive(descr) -> bool:
    """Perlin octaves / image-uv trees worth a pl.when block skip (the
    same trees shade_soa.pattern_at cond-skips per tile in XLA)."""
    if descr is None:
        return False
    return descr[0] in ("noise", "perturbed", "image") \
        or _descr_expensive(descr[3]) or _descr_expensive(descr[4])


def _torus_slots_guarded(p, o: V3, d: V3, trefs):
    """soa._torus_slots_nocond with the quartic under a block-level
    pl.when on its AABB gate: a 512-ray block that never reaches the
    torus's box skips the ~400-op Ferrari+Newton solve entirely
    (ablation: the unconditional quartic was 0.9 ms of the 5.6 ms
    config5 frame — tori are screen-local). Roots/valids round-trip
    through 8 scratch tiles because pl.when bodies cannot return values;
    blocks that skip read the zero init = no valid slots, which is
    exactly what the gate proves."""
    from ..ops import quartic as q
    minor_r = p(31)
    pad = 1e-3
    rx = 1.0 + minor_r + pad
    rz = minor_r + pad

    def inv(c):
        return 1.0 / jnp.where(jnp.abs(c) < 1e-30,
                               jnp.where(c < 0, -1e-30, 1e-30), c)

    ivx, ivy, ivz = inv(d.x), inv(d.y), inv(d.z)
    tx1 = (-rx - o.x) * ivx
    tx2 = (rx - o.x) * ivx
    ty1 = (-rx - o.y) * ivy
    ty2 = (rx - o.y) * ivy
    tz1 = (-rz - o.z) * ivz
    tz2 = (rz - o.z) * ivz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                   jnp.minimum(ty1, ty2)),
                       jnp.minimum(tz1, tz2))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                   jnp.maximum(ty1, ty2)),
                       jnp.maximum(tz1, tz2))
    enter = (tmin <= tmax) & (tmax >= 0.0)
    zero = jnp.zeros_like(o.x)
    # Only the validity refs need init: consumers mask t through
    # where(valid & ..., t, _INF), so skipped blocks' stale root values
    # are never read.
    for ref in trefs[4:]:
        ref[...] = zero

    @pl.when(jnp.any(enter))
    def _():
        r_sq = minor_r * minor_r
        sum_d_sq = d.dot(d)
        e = o.dot(o) - r_sq + 1.0
        f = o.dot(d)
        a4 = sum_d_sq * sum_d_sq
        a3 = 4.0 * sum_d_sq * f
        a2 = (2.0 * sum_d_sq * e + 4.0 * f * f
              - 4.0 * (d.x * d.x + d.y * d.y))
        a1 = 4.0 * e * f - 8.0 * (o.x * d.x + o.y * d.y)
        a0 = e * e - 4.0 * (o.x * o.x + o.y * o.y)
        roots, valids = q.solve_quartic_parts(a4, a3, a2, a1, a0,
                                              safe_transcendentals=True)
        for k in range(4):
            trefs[k][...] = roots[k]
            trefs[4 + k][...] = (valids[k] & (roots[k] > 0.0)
                                 & enter).astype(o.x.dtype)

    return [(trefs[k][...], trefs[4 + k][...] != 0.0) for k in range(4)]


def _eval_pattern_tex(descr, pat, pts: V3, uv_fn):
    """shade_soa.eval_pattern, SMEM coefficients, extended with the
    affine texture-completion contract.

    Returns (color V3, coeff, texidx) where coeff/texidx are None for
    image-free subtrees (static). Every pattern combinator is AFFINE in
    its children's color values with channel-independent weights
    (selects, lerps, blends, +-noise scaling), so a tree with one image
    leaf evaluates exactly as `color0 + coeff * texel`: color0 is the
    tree with the leaf at 0 and coeff is the accumulated scalar weight
    along the leaf's path. `texidx` is the leaf's FLAT texel index
    (offset-partitioned across all scene textures, exact in f32 below
    2^24) computed from the winner-shape uv of the leaf's pattern-space
    point with _sample_texture's exact clamp/flip arithmetic
    (pattern.rs:209-213, texture.rs:32-54), routed up statically —
    applicable() caps trees at one image leaf."""
    from ..ops import noise as fnl
    ptype, idx, meta, da, db = descr
    g = lambda k: pat[idx, k]
    if ptype == "solid":
        like = jnp.ones_like(pts.x)
        return V3(g(12) * like, g(13) * like, g(14) * like), None, None
    p = V3(g(0) * pts.x + g(1) * pts.y + g(2) * pts.z + g(3),
           g(4) * pts.x + g(5) * pts.y + g(6) * pts.z + g(7),
           g(8) * pts.x + g(9) * pts.y + g(10) * pts.z + g(11))
    if ptype == "image":
        uu, vv = uv_fn(p)
        h, w, off = meta
        uu = jnp.clip(uu, 0.0, 1.0)
        vv = jnp.clip(vv, 0.0, 1.0)
        xi = jnp.minimum((uu * w).astype(jnp.int32), w - 1)
        yi = (h - 1) - jnp.minimum((vv * h).astype(jnp.int32), h - 1)
        texidx = (yi * w + xi + off).astype(p.x.dtype)
        z = jnp.zeros_like(p.x)
        return V3(z, z, z), jnp.ones_like(p.x), texidx
    if ptype == "perturbed":
        sc = g(15)
        per = g(16)
        nx = fnl.octave_perlin(p.x, p.y, p.z, meta, per) * sc
        ny = fnl.octave_perlin(p.x, p.y, p.z + 1.0, meta, per) * sc
        nz = fnl.octave_perlin(p.x, p.y, p.z + 2.0, meta, per) * sc
        return _eval_pattern_tex(da, pat, p + V3(nx, ny, nz), uv_fn)
    a, ca, ia = _eval_pattern_tex(da, pat, p, uv_fn)
    b, cb, ib = _eval_pattern_tex(db, pat, p, uv_fn)
    ii = ia if ia is not None else ib

    def combine(wa, wb):
        """coeff under affine child weights (None coeff = statically 0)."""
        if ca is None and cb is None:
            return None
        out = ca * wa if ca is not None else jnp.zeros_like(pts.x)
        if cb is not None:
            out = out + cb * wb
        return out

    if ptype == "gradient":
        frac = p.x - jnp.floor(p.x)
        return a + (b - a) * frac, combine(1.0 - frac, frac), ii
    if ptype == "blend":
        s = g(15)
        return a * (1.0 - s) + b * s, combine(1.0 - s, s), ii
    if ptype == "noise":
        n = fnl.octave_perlin(p.x, p.y, p.z, meta, g(16)) * g(15)
        neg = n <= 0.0
        col = V3(jnp.where(neg, a.x * -n, b.x * n),
                 jnp.where(neg, a.y * -n, b.y * n),
                 jnp.where(neg, a.z * -n, b.z * n))
        negf = neg.astype(n.dtype)
        return col, combine(-n * negf, n * (1.0 - negf)), ii
    if ptype == "stripe":
        cond = jnp.mod(jnp.floor(p.x), 2.0) == 0.0
    elif ptype == "ring":
        cond = jnp.mod(jnp.floor(jnp.sqrt(p.x * p.x + p.z * p.z)),
                       2.0) == 0.0
    else:  # checker
        cond = jnp.mod(jnp.floor(p.x) + jnp.floor(p.y) + jnp.floor(p.z),
                       2.0) == 0.0
    condf = cond.astype(pts.x.dtype)
    col = V3(jnp.where(cond, a.x, b.x), jnp.where(cond, a.y, b.y),
             jnp.where(cond, a.z, b.z))
    return col, combine(condf, 1.0 - condf), ii


def _eval_pattern(descr, pat, pts: V3) -> V3:
    """Color-only pattern eval (image-free trees)."""
    col, _, _ = _eval_pattern_tex(descr, pat, pts, None)
    return col


def _tile_inv(c):
    """Zero-safe reciprocal of a direction component (tile)."""
    return 1.0 / jnp.where(jnp.abs(c) < 1e-30,
                           jnp.where(c < 0, -1e-30, 1e-30), c)


def _tile_slab(o: V3, ix, iy, iz, b, c):
    """AABB slab test of tile rays against SMEM box column c ->
    (tmin, tmax) tiles (cube.rs:48-61 form, like triangles._ray_slab)."""
    tx1 = (b[0, c] - o.x) * ix
    tx2 = (b[3, c] - o.x) * ix
    ty1 = (b[1, c] - o.y) * iy
    ty2 = (b[4, c] - o.y) * iy
    tz1 = (b[2, c] - o.z) * iz
    tz2 = (b[5, c] - o.z) * iz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                   jnp.minimum(ty1, ty2)),
                       jnp.minimum(tz1, tz2))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                   jnp.maximum(ty1, ty2)),
                       jnp.maximum(tz1, tz2))
    return tmin, tmax


def _mesh_mt(g, o: V3, d: V3):
    """Möller–Trumbore of tile rays against ONE triangle whose
    components are SMEM scalars via g(col) (triangle.rs:72-94; the
    scalar-broadcast dual of triangles._mt_rows — one (8, 512) tile op
    covers 4096 ray/triangle pairs at full lane occupancy, where the
    standalone kernel's [1, BR] row ops idle 7/8 of every vreg).

    Returns (tt with misses at +inf, uu, vv) tiles."""
    e1x, e1y, e1z = g(3), g(4), g(5)
    e2x, e2y, e2z = g(6), g(7), g(8)
    cx = d.y * e2z - d.z * e2y
    cy = d.z * e2x - d.x * e2z
    cz = d.x * e2y - d.y * e2x
    det = e1x * cx + e1y * cy + e1z * cz
    ok = jnp.abs(det) >= EPSILON
    f = 1.0 / jnp.where(ok, det, 1.0)
    sx = o.x - g(0)
    sy = o.y - g(1)
    sz = o.z - g(2)
    uu = f * (sx * cx + sy * cy + sz * cz)
    ok = ok & (uu >= 0.0) & (uu <= 1.0)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    vv = f * (d.x * qx + d.y * qy + d.z * qz)
    ok = ok & (vv >= 0.0) & (uu + vv <= 1.0)
    tt = f * (e2x * qx + e2y * qy + e2z * qz)
    ok = ok & (tt >= 0.0)
    return jnp.where(ok, tt, _INF), uu, vv


def _mesh_closest(Tp, tris, boxes, o: V3, d: V3, bound, mrefs):
    """Closest mesh hit for tile rays -> written into the 5 scratch
    refs (t, nx, ny, nz, prim). `bound` is the analytic best t: a
    chunk is entered only when some ray reaches its AABB before BOTH
    the analytic hit and the running mesh best (the t_init seeding of
    ops/soa._pallas_triangle_best, in-register). Accumulation lives in
    refs because pl.when bodies cannot return values — and lax.cond is
    flattened by Mosaic to both-branches + select, which would defeat
    the cull entirely."""
    mt_ref, mnx_ref, mny_ref, mnz_ref, mp_ref = mrefs
    inf = jnp.full_like(o.x, _INF)
    zero = jnp.zeros_like(o.x)
    mt_ref[...] = inf
    mnx_ref[...] = zero
    mny_ref[...] = zero
    mnz_ref[...] = zero
    mp_ref[...] = zero
    ix, iy, iz = _tile_inv(d.x), _tile_inv(d.y), _tile_inv(d.z)
    n_chunks = Tp // MESH_CHUNK

    wmin, wmax = _tile_slab(o, ix, iy, iz, boxes, n_chunks)  # whole mesh
    whole = (wmin <= wmax) & (wmax >= 0.0) & (wmin < bound)

    @pl.when(jnp.any(whole))
    def _mesh():
        for c in range(n_chunks):
            tmin, tmax = _tile_slab(o, ix, iy, iz, boxes, c)
            enter = ((tmin <= tmax) & (tmax >= 0.0)
                     & (tmin < jnp.minimum(mt_ref[...], bound)))

            @pl.when(jnp.any(enter))
            def _chunk(c=c):
                bt = mt_ref[...]
                bnx, bny, bnz = mnx_ref[...], mny_ref[...], mnz_ref[...]
                bp = mp_ref[...]
                for i in range(c * MESH_CHUNK, (c + 1) * MESH_CHUNK):
                    g = lambda k, i=i: tris[i, k]
                    tt, uu, vv = _mesh_mt(g, o, d)
                    better = tt < bt
                    # Interpolated world vertex normal
                    # (smooth_triangle.rs:99-101; flat tris store
                    # n1=n2=n3 so one formula serves both).
                    w1 = 1.0 - uu - vv
                    bt = jnp.where(better, tt, bt)
                    bnx = jnp.where(better, w1 * g(9) + uu * g(12)
                                    + vv * g(15), bnx)
                    bny = jnp.where(better, w1 * g(10) + uu * g(13)
                                    + vv * g(16), bny)
                    bnz = jnp.where(better, w1 * g(11) + uu * g(14)
                                    + vv * g(17), bnz)
                    bp = jnp.where(better, g(18) + zero, bp)
                mt_ref[...] = bt
                mnx_ref[...] = bnx
                mny_ref[...] = bny
                mnz_ref[...] = bnz
                mp_ref[...] = bp


def _mesh_occludes(Tp, tris, boxes, over: V3, sx, sy, sz, dist, occ_ref,
                   occ0):
    """Mesh shadow any-hit for tile rays: occ_ref := occ0 | (some
    triangle with 0 <= t < dist). Chunks every ray of which is already
    occluded (or unreachable before `dist`) are skipped."""
    occ_ref[...] = occ0
    d = V3(sx, sy, sz)
    ix, iy, iz = _tile_inv(sx), _tile_inv(sy), _tile_inv(sz)
    n_chunks = Tp // MESH_CHUNK

    wmin, wmax = _tile_slab(over, ix, iy, iz, boxes, n_chunks)
    whole = ((wmin <= wmax) & (wmax >= 0.0) & (wmin < dist)
             & (occ_ref[...] == 0.0))

    @pl.when(jnp.any(whole))
    def _mesh():
        for c in range(n_chunks):
            tmin, tmax = _tile_slab(over, ix, iy, iz, boxes, c)
            enter = ((tmin <= tmax) & (tmax >= 0.0) & (tmin < dist)
                     & (occ_ref[...] == 0.0))

            @pl.when(jnp.any(enter))
            def _chunk(c=c):
                occ = occ_ref[...] != 0.0
                for i in range(c * MESH_CHUNK, (c + 1) * MESH_CHUNK):
                    g = lambda k, i=i: tris[i, k]
                    tt, _, _ = _mesh_mt(g, over, d)
                    occ = occ | (tt < dist)
                occ_ref[...] = occ.astype(jnp.float32)


def _node_row(kinds, pat_descrs, prim_pat, lmeta, cmeta, textured, level,
              has_refl, has_refr, prims, pat, lights, seeds, o: V3, d: V3,
              mesh_ctx=None, prefs=None, trefs=None):
    """One Whitted node over a ray row — the in-register transcript of
    integrator._sorted_node_eval / _fast_node_eval. `lmeta` is the
    static per-light (kind, level) tuple; area shadow fractions run the
    full level^2 jittered-sample loop with the point-keyed hash draws of
    ops/jitter.py (bit-identical to the XLA loop's) seeded from
    seeds[level, light] (SMEM — the XLA fold_in chain evaluated
    host-side). `mesh_ctx` = (Tp, pids, tris, boxes, mrefs, occ_ref)
    activates the fused triangle fold (closest hit, interpolated
    normals, shadow any-hit) for mesh scenes. `cmeta` = (per-prim
    member flags, (op, sides) list) activates the in-register CSG
    parity filter (soa.csg_keeps) on closest hits AND shadow segments
    (any_hit_hybrid semantics, scene.rs:234-245 over csg.rs:177-195).

    Returns (surface, over, under, reflectv, refr_dir, refl_w, refr_w,
    tex) where tex is None or (texmul V3, u, v, root) — the affine
    texture-completion channels (see applicable())."""
    from ..ops import jitter as jt
    from ..ops import soa
    P = len(kinds)
    reader = lambda i: (lambda k, i=i: prims[i, k])
    false = jnp.zeros_like(o.x, bool)
    member_flags, ops_sides = cmeta if cmeta and cmeta[0] else ((), ())

    def is_member(i):
        return bool(member_flags[i]) if i < len(member_flags) else False

    # --- closest hit: same fold order as soa.closest_hit_soa /
    # closest_hit_hybrid (strict < keeps the earlier prim on ties;
    # triangle prims fold after the analytic non-members, CSG members
    # last — exactly the hybrid merge order). Object-space rays and
    # slots are kept for the n1/n2 crossing folds below — the fusion
    # the XLA path can't do without materializing [K, R] slot buffers.
    slots_per_prim = []
    best_t = jnp.full_like(o.x, _INF)
    win = []  # one-hot winner masks per prim
    for i, kind in enumerate(kinds):
        if kind == sd.TRIANGLE:
            slots_per_prim.append(())
            win = win + [false]
            continue
        p = reader(i)
        ol = _affine_pt(p, 0, o)
        dl = _affine_vec(p, 0, d)
        if kind == sd.TORUS and trefs is not None:
            slots = _torus_slots_guarded(p, ol, dl, trefs)
        else:
            slots = _prim_slots(kind, p, ol, dl)
        slots_per_prim.append(slots)
        if is_member(i):
            win = win + [false]  # folded after the CSG filter below
            continue
        tp = jnp.full_like(o.x, _INF)
        for t, valid in slots:
            tp = jnp.minimum(tp, jnp.where(valid & (t >= 0.0), t, _INF))
        better = tp < best_t
        best_t = jnp.where(better, tp, best_t)
        win = [w & ~better for w in win] + [better]
        win[i] = better  # list append order == prim order
    # Rebuild as a dense per-prim list (members/triangles were skipped).
    while len(win) < P:
        win.append(false)
    analytic = [i for i, k in enumerate(kinds) if k != sd.TRIANGLE]

    if mesh_ctx is not None:
        # Mesh fold, seeded by the analytic best (its refs accumulate
        # across per-chunk pl.when regions; see _mesh_closest).
        mTp, mreps, mtris, mboxes, mrefs, mocc_ref = mesh_ctx
        _mesh_closest(mTp, mtris, mboxes, o, d, best_t, mrefs)
        m_t = mrefs[0][...]
        mesh_win = m_t < best_t
        best_t = jnp.where(mesh_win, m_t, best_t)
        win = [w & ~mesh_win for w in win]
        m_n = V3(mrefs[1][...], mrefs[2][...], mrefs[3][...])
        m_gid = mrefs[4][...]
    else:
        mesh_win = None

    def member_filtered(slot_lists):
        """(ts, pids, keeps) of CSG-member slots under soa.csg_keeps."""
        m_ts, m_pids, m_valids = [], [], []
        for i, kind in enumerate(kinds):
            if not is_member(i):
                continue
            for t, valid in slot_lists[i]:
                m_ts.append(t)
                m_pids.append(i)
                m_valids.append(valid)
        ops_and_sides = tuple((op, tuple(srow[pid] for pid in m_pids))
                              for op, srow in ops_sides)
        return m_ts, m_pids, soa.csg_keeps(m_ts, m_valids, ops_and_sides)

    if member_flags and any(member_flags):
        m_ts, m_pids, m_keeps = member_filtered(slots_per_prim)
        for t, pid_i, keep in zip(m_ts, m_pids, m_keeps):
            cand = keep & (t >= 0.0) & (t < best_t)
            best_t = jnp.where(cand, t, best_t)
            win = [w & ~cand for w in win]
            win[pid_i] = win[pid_i] | cand
            if mesh_win is not None:
                mesh_win = mesh_win & ~cand
    found = jnp.isfinite(best_t)
    t_safe = jnp.where(found, best_t, 0.0)
    point = o + d * t_safe
    eyev = -d

    zeroR = jnp.zeros_like(o.x)

    def sel3(v3_fn):
        """Winner-select a per-prim V3 (one-hot masks, few prims)."""
        ax = ay = az = zeroR
        for i in analytic:
            v = v3_fn(i)
            ax = jnp.where(win[i], v.x, ax)
            ay = jnp.where(win[i], v.y, ay)
            az = jnp.where(win[i], v.z, az)
        return V3(ax, ay, az)

    def mat(k):
        acc = zeroR
        for i in analytic:
            acc = jnp.where(win[i], prims[i, k], acc)
        if mesh_win is not None:
            for gid, rep in enumerate(mreps):
                acc = jnp.where(mesh_win & (m_gid == float(gid)),
                                prims[rep, k], acc)
        return acc

    # --- normal: winner's kind formula on ITS object-space point,
    # through ITS normal matrix (shade_soa.normal_at), eye flip. Mesh
    # winners carry the interpolated world vertex normal from the fold.
    def world_normal(i):
        p = reader(i)
        lp_i = _affine_pt(p, 0, point)
        return _nmat_vec(p, _local_normal(kinds[i], p, lp_i))

    nsel = sel3(world_normal)
    if mesh_win is not None:
        nsel = V3(jnp.where(mesh_win, m_n.x, nsel.x),
                  jnp.where(mesh_win, m_n.y, nsel.y),
                  jnp.where(mesh_win, m_n.z, nsel.z))
    normalv = nsel.normalize()
    inside = normalv.dot(eyev) < 0.0
    normalv = normalv * jnp.where(inside, -1.0, 1.0)
    over = point + normalv * _EPS_OFF
    under = point - normalv * _EPS_OFF

    # --- n1/n2: crossing-parity folds over the SAME slots
    # (soa.refractive_indices_direct semantics, slot reuse in-register).
    if has_refr:
        t_hit = jnp.where(found, best_t, -1.0)
        tol = _TOL * jnp.maximum(1.0, jnp.abs(t_hit))
        neg = jnp.full_like(o.x, -_INF)
        bts, btl = neg, neg
        n1 = jnp.ones_like(o.x)
        n2 = jnp.ones_like(o.x)
        ior_s = n1
        ior_l = n2
        for i in range(P):
            cnt_s = jnp.zeros_like(o.x, jnp.int32)
            last_s = neg
            cnt_l = jnp.zeros_like(o.x, jnp.int32)
            last_l = neg
            for t, valid in slots_per_prim[i]:
                is_hit = win[i] & (jnp.abs(t - t_hit) <= tol)
                before = valid & (t < t_hit)
                in_s = before & ~is_hit
                in_l = before | (valid & is_hit)
                cnt_s = cnt_s + in_s.astype(jnp.int32)
                last_s = jnp.maximum(last_s, jnp.where(in_s, t, neg))
                cnt_l = cnt_l + in_l.astype(jnp.int32)
                last_l = jnp.maximum(last_l, jnp.where(in_l, t, neg))
            ior_i = prims[i, 30]
            bs = ((cnt_s % 2) == 1) & (last_s > bts)
            bts = jnp.where(bs, last_s, bts)
            ior_s = jnp.where(bs, ior_i, ior_s)
            bl = ((cnt_l % 2) == 1) & (last_l > btl)
            btl = jnp.where(bl, last_l, btl)
            ior_l = jnp.where(bl, ior_i, ior_l)
        n1 = jnp.where(jnp.isfinite(bts) & (bts > -_INF), ior_s, n1)
        n2 = jnp.where(jnp.isfinite(btl) & (btl > -_INF), ior_l, n2)
    else:
        n1 = n2 = jnp.ones_like(o.x)

    # --- pattern at over (winner's static tree on ITS object space).
    # Textured trees additionally yield (coeff, u, v) — the affine
    # texture-completion channels, winner-selected like the color.
    # Cheap trees evaluate in REGISTERS; expensive trees (Perlin
    # octaves, image uv) evaluate under a block-level pl.when on the
    # prim's winner mask — patterns are screen-local, so most blocks
    # skip them entirely (the in-kernel analog of
    # shade_soa.pattern_at's per-tile lax.cond). Only the when-gated
    # values round-trip through the `prefs` scratch tiles (pl.when
    # bodies cannot return values; routing EVERY prim through scratch
    # measured ~1 ms of read-modify-write VMEM traffic per 1080p
    # frame).
    zeroR_ = jnp.zeros_like(o.x)
    coeff = tex_idx = None
    bx = by = bz = zeroR_
    if textured:
        coeff = zeroR_
        tex_idx = zeroR_ - 1.0

    def eval_prim(i):
        pr = reader(i)
        pp = _affine_pt(pr, 0, over)
        uv_fn = (lambda q, kind=kinds[i], pr=pr: _uv_kind(kind, pr, q))
        return _eval_pattern_tex(pat_descrs[prim_pat[i]], pat, pp, uv_fn)

    exp_ids = [i for i in analytic
               if _descr_expensive(pat_descrs[prim_pat[i]])]
    use_scratch = prefs is not None and exp_ids
    for i in analytic:
        if use_scratch and i in exp_ids:
            continue
        col, co, ti = eval_prim(i)
        bx = jnp.where(win[i], col.x, bx)
        by = jnp.where(win[i], col.y, by)
        bz = jnp.where(win[i], col.z, bz)
        if textured and co is not None:
            coeff = jnp.where(win[i], co, coeff)
            tex_idx = jnp.where(win[i], ti, tex_idx)
    if use_scratch:
        for ref in prefs[:3]:
            ref[...] = zeroR_
        if textured:
            prefs[3][...] = zeroR_
            prefs[4][...] = zeroR_ - 1.0
        for i in exp_ids:
            @pl.when(jnp.any(win[i]))
            def _(i=i):
                col, co, ti = eval_prim(i)
                prefs[0][...] = jnp.where(win[i], col.x, prefs[0][...])
                prefs[1][...] = jnp.where(win[i], col.y, prefs[1][...])
                prefs[2][...] = jnp.where(win[i], col.z, prefs[2][...])
                if textured and co is not None:
                    prefs[3][...] = jnp.where(win[i], co, prefs[3][...])
                    prefs[4][...] = jnp.where(win[i], ti, prefs[4][...])
        exp_any = false
        for i in exp_ids:
            exp_any = exp_any | win[i]
        bx = jnp.where(exp_any, prefs[0][...], bx)
        by = jnp.where(exp_any, prefs[1][...], by)
        bz = jnp.where(exp_any, prefs[2][...], bz)
        if textured:
            coeff = jnp.where(exp_any, prefs[3][...], coeff)
            tex_idx = jnp.where(exp_any, prefs[4][...], tex_idx)
    base = V3(bx, by, bz)
    if mesh_win is not None:
        for gid, rep in enumerate(mreps):
            pv = _eval_pattern(pat_descrs[prim_pat[rep]], pat,
                               _affine_pt(reader(rep), 0, over))
            m = mesh_win & (m_gid == float(gid))
            base = V3(jnp.where(m, pv.x, base.x),
                      jnp.where(m, pv.y, base.y),
                      jnp.where(m, pv.z, base.z))

    # --- Phong per light with binary point shadows (light.rs:98-140).
    surface = V3(jnp.zeros_like(o.x), jnp.zeros_like(o.x),
                 jnp.zeros_like(o.x))
    amb, dif, spe, shi = mat(24), mat(25), mat(26), mat(27)

    def occludes_seg(sx, sy, sz, dist):
        occ = jnp.zeros_like(o.x, bool)
        sv = V3(sx, sy, sz)
        shadow_slots = {}
        for i, kind in enumerate(kinds):
            if kind == sd.TRIANGLE:
                continue
            if is_member(i) or kind == sd.TORUS:
                # Slot forms on the object-space segment ray: member
                # slots feed the CSG filter below (any_hit_hybrid
                # semantics); tori have no div-free interval form.
                p = reader(i)
                ol_s = _affine_pt(p, 0, over)
                dl_s = _affine_vec(p, 0, sv)
                if kind == sd.TORUS and trefs is not None:
                    slots = _torus_slots_guarded(p, ol_s, dl_s, trefs)
                else:
                    slots = _prim_slots(kind, p, ol_s, dl_s)
                if is_member(i):
                    shadow_slots[i] = slots
                    continue
                for t, valid in slots:
                    occ = occ | (valid & (t >= 0.0) & (t < dist))
                continue
            # _occludes reads the 16-col analytic layout (extras —
            # ymin/ymax/closed — at 12-14); this kernel's 32-col rows
            # keep the normal matrix there and the extras at 21-23, so
            # remap the reader (12->21, 13->22, 14->23).
            occ = occ | _occludes(kind,
                                  lambda j, i=i: prims[i, j + 9
                                                       if j >= 12 else j],
                                  over.x, over.y, over.z, sx, sy, sz,
                                  dist)
        if shadow_slots:
            slot_lists = [shadow_slots.get(i, ()) for i in range(P)]
            s_ts, _, s_keeps = member_filtered(slot_lists)
            for t, keep in zip(s_ts, s_keeps):
                occ = occ | (keep & (t >= 0.0) & (t < dist))
        if mesh_ctx is not None:
            _mesh_occludes(mTp, mtris, mboxes, over, sx, sy, sz, dist,
                           mocc_ref, occ.astype(o.x.dtype))
            occ = mocc_ref[...] != 0.0
        return occ

    # Single-light scenes accumulate the scalar base-weight only (3
    # fewer live tiles in a register-starved kernel); the intensity
    # multiply happens once at the end.
    single_light = len(lmeta) == 1
    texw = jnp.zeros_like(o.x) if (textured and single_light) else None
    texa = V3(jnp.zeros_like(o.x), jnp.zeros_like(o.x),
              jnp.zeros_like(o.x)) if (textured
                                       and not single_light) else None
    for li, (lkind, llevel) in enumerate(lmeta):
        L = lambda j: lights[li, j]
        if lkind == "point":
            to = V3(L(0) - over.x, L(1) - over.y, L(2) - over.z)
            dist = to.norm()
            direction = to * (1.0 / jnp.maximum(dist, 1e-30))
            frac = occludes_seg(direction.x, direction.y, direction.z,
                                dist).astype(o.x.dtype)
        else:
            # level^2 jittered grid samples (light.rs:47-65 semantics,
            # scene.rs:181-214 fraction), draws recomputed in-register.
            n = llevel * llevel
            hb = jt.point_base(seeds[level, li], over.x, over.y, over.z)
            cnt = jnp.zeros_like(o.x)
            for s in range(n):
                r0 = jt.draw_unit(hb, 2 * s)
                r1 = jt.draw_unit(hb, 2 * s + 1)
                ur = (float(s % llevel) + r0) / llevel
                vr = (float(s // llevel) + r1) / llevel
                sx = L(6) + L(9) * ur + L(12) * vr - over.x
                sy = L(7) + L(10) * ur + L(13) * vr - over.y
                sz = L(8) + L(11) * ur + L(14) * vr - over.z
                dist = jnp.sqrt(sx * sx + sy * sy + sz * sz)
                inv = 1.0 / jnp.maximum(dist, 1e-30)
                occ = occludes_seg(sx * inv, sy * inv, sz * inv, dist)
                cnt = cnt + occ.astype(o.x.dtype)
            frac = cnt * jnp.float32(1.0 / n)
        unshadow = 1.0 - frac
        effective = V3(base.x * L(3), base.y * L(4), base.z * L(5))
        # Phong shades from the light POSITION (area: center,
        # light.rs:41-45) with a separate normalize (rsqrt) like
        # _lighting_soa — not the shadow segment's 1/sqrt form.
        lightv = V3(L(0) - over.x, L(1) - over.y, L(2) - over.z).normalize()
        ambient = effective * amb
        ldn = lightv.dot(normalv)
        lit = ldn >= 0.0
        dscale = jnp.where(lit, dif * ldn, 0.0)
        reflectv_l = (-lightv).reflect(normalv)
        rde = reflectv_l.dot(eyev)
        spec_on = lit & (rde > 0.0)
        factor = jnp.power(jnp.maximum(rde, 1e-30), shi)
        sscale = jnp.where(spec_on, spe * factor, 0.0)
        surface = V3(
            surface.x + ambient.x + (effective.x * dscale
                                     + L(3) * sscale) * unshadow,
            surface.y + ambient.y + (effective.y * dscale
                                     + L(4) * sscale) * unshadow,
            surface.z + ambient.z + (effective.z * dscale
                                     + L(5) * sscale) * unshadow)
        if textured:
            # The base color's per-light multiplier: ambient + diffuse
            # (specular is base-free), so surface is affine in base and
            # the image texel completes as texel * (texa * coeff).
            w_base = amb + dscale * unshadow
            if single_light:
                texw = texw + w_base
            else:
                texa = V3(texa.x + L(3) * w_base, texa.y + L(4) * w_base,
                          texa.z + L(5) * w_base)
    surface = V3(jnp.where(found, surface.x, 0.0),
                 jnp.where(found, surface.y, 0.0),
                 jnp.where(found, surface.z, 0.0))
    tex = None
    if textured:
        if single_light:
            L0 = lambda j: lights[0, j]
            texa = V3(L0(3) * texw, L0(4) * texw, L0(5) * texw)
        texmul = V3(jnp.where(found, texa.x * coeff, 0.0),
                    jnp.where(found, texa.y * coeff, 0.0),
                    jnp.where(found, texa.z * coeff, 0.0))
        tex = (texmul, jnp.where(found, tex_idx, -1.0))

    reflective = jnp.where(found, mat(28), 0.0)
    transparency = jnp.where(found, mat(29), 0.0)
    reflectv = d.reflect(normalv)

    # Refraction + TIR + Schlick (scene.rs:310-336, computations.rs:39-54).
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
    if has_refl and has_refr:
        both = (reflective > 0.0) & (transparency > 0.0)
        cos_eff = jnp.where(n1 > n2, cos_t, cos_i)
        r0 = ((n1 - n2) / (n1 + n2)) ** 2
        reflectance = r0 + (1.0 - r0) * (1.0 - cos_eff) ** 5
        reflectance = jnp.where((n1 > n2) & (sin2_t > 1.0), 1.0,
                                reflectance)
        refl_w = jnp.where(both, reflective * reflectance, refl_w)
        refr_w = jnp.where(both, refr_w * (1.0 - reflectance), refr_w)
    return surface, over, under, reflectv, refr_dir, refl_w, refr_w, tex


def _kernel(kinds, pat_descrs, prim_pat, lmeta, cmeta, textured, mesh,
            depth, W, has_refl, has_refr, *refs):
    """Per-program level scan over a [SUB, BR] ray block.

    Every per-ray value is a (SUB, BR) = (8, 512) tile — a full vreg
    footprint; the first kernel shipped [1, BR] rows and wasted 7/8 of
    every vector register (measured 98 Mrays/s vs this form).

    Spawn modes: both reflection and refraction -> 2W children +
    compaction sort; exactly one -> a width-1 chain (W == 1, children
    overwrite the state); neither -> one level (depth == 0).

    st is [7*W*SUB, BR]: component c of path row r lives at sublane
    rows [(c*W + r)*SUB, +SUB) — all reads/writes are 8-sublane-aligned
    static slices. child holds spawn*W rows; acc is [3*SUB, BR]. Mesh
    scenes (mesh = (Tp, pids), Tp > 0) add the SMEM triangle table +
    chunk boxes as inputs and 6 mesh scratch tiles (5 closest-hit
    payload accumulators + 1 shadow-occlusion accumulator)."""
    refs = list(refs)
    rox, roy, roz, rdx, rdy, rdz, prims, pat, lights, seeds = refs[:10]
    del refs[:10]
    if mesh[0]:
        tris, boxes = refs[:2]
        del refs[:2]
    outr, outg, outb = refs[:3]
    del refs[:3]
    if textured:
        otmr, otmg, otmb, otidx = refs[:4]
        del refs[:4]
    st, child, acc = refs[:3]
    del refs[:3]
    any_exp = any(_descr_expensive(d) for d in pat_descrs)
    prefs = None
    if any_exp:
        n_pref = 3 + (2 if textured else 0)
        prefs = tuple(refs[:n_pref])
        del refs[:n_pref]
    has_torus = any(k == sd.TORUS for k in kinds)
    trefs = tuple(refs[:8]) if has_torus else None
    if has_torus:
        del refs[:8]
    if mesh[0]:
        mesh_ctx = (mesh[0], mesh[1], tris, boxes, tuple(refs[:5]),
                    refs[5])
    else:
        mesh_ctx = None
    zero = jnp.zeros((SUB, BR), jnp.float32)
    one = jnp.ones((SUB, BR), jnp.float32)
    both = has_refl and has_refr
    spawn = 2 if both else (1 if (has_refl or has_refr) else 0)
    W2 = max(spawn, 1) * W

    def st_rd(c, r):
        return st[(c * W + r) * SUB:(c * W + r + 1) * SUB, :]

    def st_wr(c, r, v):
        st[(c * W + r) * SUB:(c * W + r + 1) * SUB, :] = v

    def ch_rd(c, r):
        return child[(c * W2 + r) * SUB:(c * W2 + r + 1) * SUB, :]

    def ch_wr(c, r, v):
        child[(c * W2 + r) * SUB:(c * W2 + r + 1) * SUB, :] = v

    # init: row 0 = primaries (weight 1), rows 1..W-1 dead (+z dirs).
    for c, v in ((0, rox[:, :]), (1, roy[:, :]), (2, roz[:, :]),
                 (3, rdx[:, :]), (4, rdy[:, :]), (5, rdz[:, :]), (6, one)):
        st_wr(c, 0, v)
    for r in range(1, W):
        for c in range(7):
            st_wr(c, r, one if c == 5 else zero)
    for c in range(3):
        acc[c * SUB:(c + 1) * SUB, :] = zero
    if textured:
        for ref in (otmr, otmg, otmb):
            ref[:, :] = zero
        otidx[:, :] = zero - 1.0

    for level in range(depth + 1):
        last = level == depth
        alive = jnp.any(st[6 * W * SUB:7 * W * SUB, :] != 0.0)

        @pl.when(alive)
        def _level(last=last, level=level):
            spawn_here = spawn if not last else 0
            if spawn_here:
                # child rows default to dead (weight 0, +z direction).
                for r in range(W2):
                    for c in range(7):
                        ch_wr(c, r, one if c == 5 else zero)
            for r in range(W):
                @pl.when(jnp.any(st_rd(6, r) != 0.0))
                def _row(r=r, level=level, spawn_here=spawn_here):
                    w = st_rd(6, r)
                    o = V3(st_rd(0, r), st_rd(1, r), st_rd(2, r))
                    d = V3(st_rd(3, r), st_rd(4, r), st_rd(5, r))
                    surface, over, under, reflectv, refr_dir, refl_w, \
                        refr_w, tex = _node_row(kinds, pat_descrs,
                                                prim_pat, lmeta, cmeta,
                                                textured, level,
                                                has_refl, has_refr,
                                                prims, pat, lights,
                                                seeds, o, d,
                                                mesh_ctx=mesh_ctx,
                                                prefs=prefs, trefs=trefs)
                    for c, v in enumerate((surface.x, surface.y,
                                           surface.z)):
                        sl = slice(c * SUB, (c + 1) * SUB)
                        acc[sl, :] = acc[sl, :] + v * w
                    if tex is not None:
                        # depth-0 single node (applicable() gates):
                        # weight is 1, so the completion channels write
                        # straight through.
                        texmul, tidx = tex
                        otmr[:, :] = texmul.x
                        otmg[:, :] = texmul.y
                        otmb[:, :] = texmul.z
                        otidx[:, :] = tidx
                    if spawn_here:
                        first = (over, reflectv, w * refl_w) if has_refl \
                            else (under, refr_dir, w * refr_w)
                        pt, dr, cw = first
                        for c, v in ((0, pt.x), (1, pt.y), (2, pt.z),
                                     (3, dr.x), (4, dr.y), (5, dr.z),
                                     (6, cw)):
                            ch_wr(c, r, v)
                        if spawn_here == 2:
                            for c, v in ((0, under.x), (1, under.y),
                                         (2, under.z), (3, refr_dir.x),
                                         (4, refr_dir.y), (5, refr_dir.z),
                                         (6, w * refr_w)):
                                ch_wr(c, W + r, v)
            if spawn_here == 2:
                # Stable top-W by weight: odd-even transposition over the
                # 2W child rows (strict < => stable, = lax.sort order).
                rows = [[ch_rd(c, r) for c in range(7)]
                        for r in range(W2)]
                for rnd in range(W2):
                    for i in range(rnd % 2, W2 - 1, 2):
                        swap = rows[i][6] < rows[i + 1][6]
                        for c in range(7):
                            a, b = rows[i][c], rows[i + 1][c]
                            rows[i][c] = jnp.where(swap, b, a)
                            rows[i + 1][c] = jnp.where(swap, a, b)
                for r in range(W):
                    for c in range(7):
                        st_wr(c, r, rows[r][c])
            elif spawn_here == 1:
                # Width-1 chain: the single child row becomes the state.
                for c in range(7):
                    st_wr(c, 0, ch_rd(c, 0))

    outr[:, :] = acc[0 * SUB:1 * SUB, :]
    outg[:, :] = acc[1 * SUB:2 * SUB, :]
    outb[:, :] = acc[2 * SUB:3 * SUB, :]


@functools.partial(jax.jit, static_argnames=(
    "kinds", "pat_descrs", "prim_pat", "lmeta", "csg", "textured",
    "mesh", "depth", "W", "has_refl", "has_refr", "interpret"))
def whitted_compact(ro_comps, rd_comps, prim_tbl, pat_tbl, light_tbl,
                    seeds, kinds, pat_descrs, prim_pat, lmeta,
                    depth: int, W: int, has_refl: bool, has_refr: bool,
                    tri_tbl=None, tri_boxes=None, mesh=(0, ()),
                    csg=((), ()), textured: bool = False,
                    interpret: bool = False):
    """Fused Whitted evaluation -> (r, g, b[, texmul rgb, texidx])
    [R] f32 tuples.

    ro/rd_comps: 3-tuples of [R] f32; prim_tbl [P,32], pat_tbl [N,17],
    light_tbl [L,15] (see pack_*); seeds [depth+1, L] int32 per-level
    per-light jitter seeds (the XLA fold_in chain evaluated host-side);
    statics mirror the scene structure (lmeta from light_meta(), mesh
    from mesh_meta() with tri_tbl/tri_boxes from pack_tris(), csg from
    csg_meta()). textured=True (depth-0 only) appends the 4 affine
    texture-completion channels (multiplier rgb + flat texel index);
    the caller adds `texel[texidx] * texmul`.
    """
    assert not (textured and depth > 0), \
        "texture completion is wired for the depth-0 node only"
    R = ro_comps[0].shape[0]
    blk = SUB * BR
    padR = (-R) % blk
    f32 = jnp.float32

    def padr(c, fill=0.0):
        c = c.astype(f32)
        return jnp.pad(c, (0, padR), constant_values=fill) if padR else c

    Rp = R + padR
    nrows = Rp // BR
    args = [padr(c).reshape(nrows, BR) for c in ro_comps]
    args += [padr(c, fill=(1.0 if i == 2 else 0.0)).reshape(nrows, BR)
             for i, c in enumerate(rd_comps)]
    args += [prim_tbl.astype(f32), pat_tbl.astype(f32),
             light_tbl.astype(f32), seeds.astype(jnp.int32)]
    if mesh[0]:
        args += [tri_tbl.astype(f32), tri_boxes.astype(f32)]

    both = has_refl and has_refr
    assert both or W == 1, "width-1 chain unless both spawn"
    spawn = 2 if both else (1 if (has_refl or has_refr) else 0)
    ray_spec = pl.BlockSpec((SUB, BR), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((SUB, BR), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((7 * W * SUB, BR), f32),
        pltpu.VMEM((7 * max(spawn, 1) * W * SUB, BR), f32),
        pltpu.VMEM((3 * SUB, BR), f32),
    ]
    # Pattern winner-select accumulators (base rgb [+ coeff/u/v/root])
    # — pl.when-skipped expensive trees write through these.
    if any(_descr_expensive(d) for d in pat_descrs):
        scratch += [pltpu.VMEM((SUB, BR), f32)
                    for _ in range(3 + (2 if textured else 0))]
    if any(k == sd.TORUS for k in kinds):
        # 4 quartic roots + 4 validity masks for the guarded torus solve.
        scratch += [pltpu.VMEM((SUB, BR), f32) for _ in range(8)]
    if mesh[0]:
        # 5 mesh closest-hit accumulators (t, nx, ny, nz, prim) + 1
        # shadow-occlusion accumulator, each one (SUB, BR) tile.
        scratch += [pltpu.VMEM((SUB, BR), f32) for _ in range(6)]
    n_out = 3 + (4 if textured else 0)
    outs = pl.pallas_call(
        functools.partial(_kernel, kinds, pat_descrs, prim_pat, lmeta,
                          csg, textured, mesh, depth, W, has_refl,
                          has_refr),
        grid=(nrows // SUB,),
        in_specs=[ray_spec] * 6 + [smem] * (6 if mesh[0] else 4),
        out_specs=(out_spec,) * n_out,
        out_shape=(jax.ShapeDtypeStruct((nrows, BR), f32),) * n_out,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return tuple(o.reshape(Rp)[:R] for o in outs)
