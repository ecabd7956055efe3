"""SoA intersection + hit selection: the TPU fast path.

Everything here operates on V3 component arrays ([R] per component; see
ops/vec.py for why). Analytic primitives are unrolled in Python — scene
leaf counts are static and small — so every op is a fused elementwise
pass over the ray axis, with hits merged through a running masked min
(strict <, preserving the reference's stable-sort/first-hit tie-break,
scene.rs:97-136). Triangle meshes stream through lane-friendly [R, C]
chunks under lax.scan.

Semantics mirror ops/intersect.py (which remains the engine for the
sorted-prefix path needed by CSG and refraction): sphere.rs:64-78,
plane.rs:51-58, cube.rs:48-77, cylinder.rs:60-123, cone.rs:60-166,
torus.rs:36-93, triangle.rs:72-94.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..config import EPSILON
from ..scene import data as sd
from . import quartic
from .vec import V3, affine_point, affine_vector, take_rows

_INF = jnp.inf


@dataclasses.dataclass
class Hit:
    found: Any   # [R] bool
    t: Any       # [R]
    prim: Any    # [R] int32
    u: Any       # [R]
    v: Any       # [R]
    tri: Any     # [R] int32 (triangle row when prim is a triangle)
    # Optional fast-path extras (None when the producer didn't compute
    # them): shade-class id, and the triangle's interpolated world
    # normal straight from the Pallas kernel (unnormalized).
    cls: Any = None     # [R] int32
    tri_n: Any = None   # (nx, ny, nz) each [R]


jax.tree_util.register_dataclass(
    Hit, data_fields=["found", "t", "prim", "u", "v", "tri", "cls",
                      "tri_n"], meta_fields=[])


def _sphere_slots(o: V3, d: V3):
    a = d.dot(d)
    b = 2.0 * d.dot(o)
    c = o.dot(o) - 1.0
    disc = b * b - 4.0 * a * c
    ok = disc >= 0.0
    # 1e-30 floor (not 0): sqrt'(0) = inf meets the miss rays' zero
    # cotangent as 0*inf = NaN, poisoning every upstream parameter's
    # gradient. Forward t values change only in the measure-zero band
    # 0 < disc < 1e-30 (and miss slots are discarded by `ok` anyway).
    sq = jnp.sqrt(jnp.maximum(disc, 1e-30))
    inv2a = 0.5 / a  # |d| > 0 for camera/shadow rays
    return [((-b - sq) * inv2a, ok), ((-b + sq) * inv2a, ok)]


def _plane_slots(o: V3, d: V3):
    ok = jnp.abs(d.y) >= EPSILON
    t = -o.y / jnp.where(ok, d.y, 1.0)
    return [(t, ok)]


def _cube_slots(o: V3, d: V3):
    big = jnp.asarray(1e30, o.x.dtype)

    def axis(oc, dc):
        parallel = jnp.abs(dc) < EPSILON
        dsafe = jnp.where(parallel, 1.0, dc)
        t1 = (-1.0 - oc) / dsafe
        t2 = (1.0 - oc) / dsafe
        lo = jnp.minimum(t1, t2)
        hi = jnp.maximum(t1, t2)
        inside = (oc >= -1.0) & (oc <= 1.0)
        lo = jnp.where(parallel, jnp.where(inside, -big, big), lo)
        hi = jnp.where(parallel, jnp.where(inside, big, -big), hi)
        return lo, hi

    xlo, xhi = axis(o.x, d.x)
    ylo, yhi = axis(o.y, d.y)
    zlo, zhi = axis(o.z, d.z)
    tmin = jnp.maximum(xlo, jnp.maximum(ylo, zlo))
    tmax = jnp.minimum(xhi, jnp.minimum(yhi, zhi))
    ok = tmin <= tmax
    return [(tmin, ok), (tmax, ok)]


def _cap_slots(o: V3, d: V3, ymin, ymax, closed, cone: bool):
    cap_possible = closed & (jnp.abs(d.y) >= EPSILON)
    dsafe = jnp.where(jnp.abs(d.y) >= EPSILON, d.y, 1.0)
    out = []
    for bound in (ymin, ymax):
        t = (bound - o.y) / dsafe
        x = o.x + t * d.x
        z = o.z + t * d.z
        if cone:
            y = o.y + t * d.y
            radius = y * y
        else:
            radius = 1.0
        out.append((t, cap_possible & (x * x + z * z <= radius)))
    return out


def _cylinder_slots(o: V3, d: V3, ymin, ymax, closed):
    a = d.x * d.x + d.z * d.z
    body_possible = jnp.abs(a) > EPSILON
    b = 2.0 * (o.x * d.x + o.z * d.z)
    c = o.x * o.x + o.z * o.z - 1.0
    disc = b * b - 4.0 * a * c
    ok = body_possible & (disc >= 0.0)
    sq = jnp.sqrt(jnp.maximum(disc, 1e-30))  # NaN guard: _sphere_slots
    inv2a = 0.5 / jnp.where(body_possible, a, 1.0)
    lo = (-b - sq) * inv2a
    hi = (-b + sq) * inv2a
    lo, hi = jnp.minimum(lo, hi), jnp.maximum(lo, hi)
    y0 = o.y + lo * d.y
    y1 = o.y + hi * d.y
    slots = [(lo, ok & (ymin < y0) & (y0 < ymax)),
             (hi, ok & (ymin < y1) & (y1 < ymax))]
    # Negative discriminant returns [] outright, dropping caps too
    # (cylinder.rs:101-102).
    miss_all = body_possible & (disc < 0.0)
    for t, valid in _cap_slots(o, d, ymin, ymax, closed, cone=False):
        slots.append((t, valid & ~miss_all))
    return slots


def _cone_slots(o: V3, d: V3, ymin, ymax, closed):
    a = d.x * d.x - d.y * d.y + d.z * d.z
    b = 2.0 * (o.x * d.x - o.y * d.y + o.z * d.z)
    c = o.x * o.x - o.y * o.y + o.z * o.z
    a_small = jnp.abs(a) < EPSILON
    b_small = jnp.abs(b) < EPSILON

    t_lin = -c / jnp.where(b_small, 1.0, 2.0 * b)
    y_lin = o.y + t_lin * d.y
    lin_hit = a_small & ~b_small & (ymin < y_lin) & (y_lin < ymax)

    disc = b * b - 4.0 * a * c
    quad_path = ~(a_small & b_small) & ~lin_hit
    okq = quad_path & (disc >= 0.0)
    sq = jnp.sqrt(jnp.maximum(disc, 1e-30))  # NaN guard: _sphere_slots
    inv2a = 0.5 / jnp.where(a_small, jnp.where(a < 0, -EPSILON, EPSILON), a)
    lo = (-b - sq) * inv2a
    hi = (-b + sq) * inv2a
    lo, hi = jnp.minimum(lo, hi), jnp.maximum(lo, hi)
    y0 = o.y + lo * d.y
    y1 = o.y + hi * d.y
    slots = [(t_lin, lin_hit),
             (lo, okq & (ymin < y0) & (y0 < ymax)),
             (hi, okq & (ymin < y1) & (y1 < ymax))]
    miss_all = quad_path & (disc < 0.0)
    for t, valid in _cap_slots(o, d, ymin, ymax, closed, cone=True):
        slots.append((t, valid & ~lin_hit & ~miss_all))
    return slots


def _torus_slots(o: V3, d: V3, minor_r):
    # The quartic is by far the most expensive analytic intersection
    # (Ferrari + trig + Newton polish); gate it on the torus's object-
    # space AABB (x,y in [-(1+r),1+r], z in [-r,r] — torus faces z,
    # torus.rs:47-56) so ray batches that miss the box entirely skip it
    # via lax.cond. The box is padded so the slab test is conservative;
    # rays inside the box get the exact solver, rays outside are provably
    # misses.
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

    def full(_):
        r_sq = minor_r * minor_r
        sum_d_sq = d.dot(d)
        e = o.dot(o) - r_sq + 1.0
        f = o.dot(d)
        a4 = sum_d_sq * sum_d_sq
        a3 = 4.0 * sum_d_sq * f
        a2 = 2.0 * sum_d_sq * e + 4.0 * f * f - 4.0 * (d.x * d.x + d.y * d.y)
        a1 = 4.0 * e * f - 8.0 * (o.x * d.x + o.y * d.y)
        a0 = e * e - 4.0 * (o.x * o.x + o.y * o.y)
        roots, valids = quartic.solve_quartic_parts(a4, a3, a2, a1, a0)
        # Only t > 0 kept (torus.rs:62-90).
        return tuple(r for r in roots) + tuple(
            ok & (r > 0.0) & enter for r, ok in zip(roots, valids))

    def skip(_):
        z = jnp.zeros_like(o.x)
        no = jnp.zeros_like(enter)
        return (z, z, z, z, no, no, no, no)

    outs = jax.lax.cond(jnp.any(enter), full, skip, None)
    return [(outs[i], outs[4 + i]) for i in range(4)]


def _torus_slots_nocond(o: V3, d: V3, minor_r):
    """_torus_slots without the lax.cond batch gate and with Mosaic-safe
    transcendentals — for Pallas kernels, where Mosaic flattens cond to
    both-branches + select anyway and has no acos/cos/cbrt lowering.
    Same AABB gate, applied as a per-lane mask; same t > 0 filter
    (torus.rs:62-90)."""
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

    r_sq = minor_r * minor_r
    sum_d_sq = d.dot(d)
    e = o.dot(o) - r_sq + 1.0
    f = o.dot(d)
    a4 = sum_d_sq * sum_d_sq
    a3 = 4.0 * sum_d_sq * f
    a2 = 2.0 * sum_d_sq * e + 4.0 * f * f - 4.0 * (d.x * d.x + d.y * d.y)
    a1 = 4.0 * e * f - 8.0 * (o.x * d.x + o.y * d.y)
    a0 = e * e - 4.0 * (o.x * o.x + o.y * o.y)
    roots, valids = quartic.solve_quartic_parts(a4, a3, a2, a1, a0,
                                                safe_transcendentals=True)
    return [(r, ok & (r > 0.0) & enter) for r, ok in zip(roots, valids)]


def _leaf_slots(scene: sd.SceneData, kind: int, row: int, ro: V3, rd: V3):
    """Hit slots for one analytic leaf (local-space closed forms)."""
    if kind == sd.SPHERE:
        inv = scene.sph_inv[row]
        return _sphere_slots(affine_point(inv, ro), affine_vector(inv, rd))
    if kind == sd.PLANE:
        inv = scene.pla_inv[row]
        return _plane_slots(affine_point(inv, ro), affine_vector(inv, rd))
    if kind == sd.CUBE:
        inv = scene.cub_inv[row]
        return _cube_slots(affine_point(inv, ro), affine_vector(inv, rd))
    if kind == sd.CYLINDER:
        inv = scene.cyl_inv[row]
        return _cylinder_slots(affine_point(inv, ro), affine_vector(inv, rd),
                               scene.cyl_min[row], scene.cyl_max[row],
                               scene.cyl_closed[row])
    if kind == sd.CONE:
        inv = scene.con_inv[row]
        return _cone_slots(affine_point(inv, ro), affine_vector(inv, rd),
                           scene.con_min[row], scene.con_max[row],
                           scene.con_closed[row])
    if kind == sd.TORUS:
        inv = scene.tor_inv[row]
        return _torus_slots(affine_point(inv, ro), affine_vector(inv, rd),
                            scene.tor_r[row])
    raise AssertionError(kind)


def _tri_chunks(scene: sd.SceneData, chunk: int):
    """Triangle component tables reshaped [n_chunks, C]."""
    T = scene.counts[6]
    pad = (-T) % chunk
    n_chunks = (T + pad) // chunk

    def comp(table, j):
        col = table[:, j]
        if pad:
            col = jnp.pad(col, (0, pad))
        return col.reshape(n_chunks, chunk)

    p1 = tuple(comp(scene.tri_p1, j) for j in range(3))
    e1 = tuple(comp(scene.tri_e1, j) for j in range(3))
    e2 = tuple(comp(scene.tri_e2, j) for j in range(3))
    pid = scene.tri_prim
    if pad:
        pid = jnp.pad(pid, (0, pad))
    pid = pid.reshape(n_chunks, chunk)
    live = jnp.arange(n_chunks * chunk).reshape(n_chunks, chunk) < T
    return n_chunks, chunk, p1, e1, e2, pid, live


def _tri_chunk_best(ro: V3, rd: V3, p1, e1, e2, pid, live, base):
    """Möller–Trumbore over one [C]-chunk -> per-ray best (t,u,v,pid,tri).

    Ray components broadcast [R,1] against triangle components [1,C];
    every intermediate is a lane-friendly [R,C] elementwise value feeding
    a single min-reduction, which XLA fuses into one pass.
    """
    t, u, v, ok = _tri_chunk_eval(ro, rd, p1, e1, e2)
    ok = ok & live[None, :] & (t >= 0.0)
    t = jnp.where(ok, t, _INF)
    idx = jnp.argmin(t, axis=1).astype(jnp.int32)
    take = lambda a: jnp.take_along_axis(a, idx[:, None], axis=1)[:, 0]
    return take(t), take(u), take(v), pid[idx], (base + idx).astype(jnp.int32)


def _use_pallas(settings, dtype) -> bool:
    mode = getattr(settings, "pallas", "off")
    if mode == "on" or mode == "interpret":
        return True
    if mode == "auto":
        return dtype == jnp.float32 and jax.default_backend() != "cpu"
    return False


def _pad_tri_kernel_inputs(scene, ro, rd, normals):
    """Common ray/triangle padding for the Pallas triangle kernels."""
    from ..kernels import triangles as ktri

    T = scene.counts[6]
    R = ro.x.shape[0]
    padR = (-R) % ktri.BR

    def padr(c, fill=0.0):
        return jnp.pad(c, (0, padR), constant_values=fill) if padR else c

    ro_c = (padr(ro.x), padr(ro.y), padr(ro.z))
    rd_c = (padr(rd.x), padr(rd.y), padr(rd.z))
    geom = (scene.tri_p1, scene.tri_e1, scene.tri_e2)
    ntabs = (scene.tri_n1, scene.tri_n2, scene.tri_n3) if normals else ()
    padT = (-T) % ktri.chunk_size(T)

    def padt(c, fill=0.0):
        return jnp.pad(c, (0, padT), constant_values=fill) if padT else c

    # Pad p1 far away (zero edges) so padded chunks cull cleanly; the
    # BVH build does its own padding so it takes the unpadded columns.
    tri_lin = tuple(padt(tbl[:, j], fill=(ktri._FAR if k == 0 else 0.0))
                    for k, tbl in enumerate(geom + ntabs)
                    for j in range(3))
    tri_bvh = tuple(tbl[:, j] for tbl in geom + ntabs for j in range(3))
    # Winner payload columns selected in-kernel (prim id, shade class as
    # f32 — exact below 2^24): an XLA `take` on the returned index costs
    # ~1 elem/cycle and measured ~2 ms per gather at 480k rays.
    aux_bvh = (scene.tri_prim.astype(jnp.float32),
               scene.tri_class.astype(jnp.float32))
    aux_lin = tuple(padt(a) for a in aux_bvh)
    return ro_c, rd_c, tri_lin, tri_bvh, aux_lin, aux_bvh, padr


def _pallas_triangle_any(scene: sd.SceneData, ro: V3, rd: V3, settings,
                         distance):
    """Bounded any-hit (shadow occlusion) via a Pallas kernel -> bool [R].

    The linear-chunk any-hit kernel skips the closest-hit payload
    machinery entirely (one any-reduction per chunk) and the distance
    cap tightens its AABB cull; the BVH path stops a ray block as soon
    as every ray has a hit inside `distance`."""
    from ..kernels import bvh as kbvh
    from ..kernels import triangles as ktri

    T = scene.counts[6]
    R = ro.x.shape[0]
    interpret = getattr(settings, "pallas", "off") == "interpret"
    # Occlusion is a comparison outcome — zero gradient almost
    # everywhere, exactly like the analytic shadow predicates — and the
    # Pallas kernels define no AD rule, so cut tangents here rather than
    # give the kernel a (vacuous) VJP.
    sg = jax.lax.stop_gradient
    ro_c, rd_c, tri_lin, tri_bvh, _, _, padr = _pad_tri_kernel_inputs(
        scene, sg(ro), sg(rd), normals=False)
    tri_lin, tri_bvh = sg(tri_lin), sg(tri_bvh)
    # Padding rays carry dist 0: the kernels treat them as already
    # satisfied so they don't block block-level early exit.
    dist = padr(sg(distance), 0.0)
    if T >= getattr(settings, "bvh_min_tris", 1024):
        ct = kbvh.bvh_closest_triangle(ro_c, rd_c, tri_bvh, dist=dist,
                                       any_hit=True,
                                       leaf=int(getattr(settings,
                                                        "bvh_leaf", 256)),
                                       interpret=interpret)[0]
        return (ct < dist)[:R]
    hit = ktri.any_triangle(ro_c, rd_c, tri_lin, dist, interpret=interpret)
    return hit[:R] != 0


def _mt_winner_xla(live, normals, ro_c, rd_c, gathered):
    """Differentiable XLA recompute of the winning triangle's
    Möller–Trumbore outputs (triangle.rs:72-94) from the winner's
    PRE-GATHERED components.

    Backward-pass helper for the Pallas kernels (which define no AD
    rule): the discrete winner is treated as locally constant — exact
    almost everywhere, the same argmin convention `_compact_topw` uses —
    and the continuous outputs (t, u, v[, interpolated world normal,
    smooth_triangle.rs:99-101]) are recomputed as a plain elementwise
    chain so jax.vjp pulls cotangents back to the ray components AND the
    gathered triangle values. The caller routes those back to the [T]
    tables with `_winner_segment_sum` — letting jax.vjp transpose a
    per-element gather instead would emit 18 XLA scatter-adds, which ran
    at ~1 element/cycle and were 40 of the 41.7 ms config4 backward.
    `live` is a closed-over constant; miss rays carry idx 0 (a real
    triangle), so every gathered value is finite and masked cotangents
    stay NaN-free."""
    g = lambda k: gathered[k]
    ox, oy, oz = ro_c
    dx, dy, dz = rd_c
    p1x, p1y, p1z = g(0), g(1), g(2)
    e1x, e1y, e1z = g(3), g(4), g(5)
    e2x, e2y, e2z = g(6), g(7), g(8)
    cx = dy * e2z - dz * e2y
    cy = dz * e2x - dx * e2z
    cz = dx * e2y - dy * e2x
    det = e1x * cx + e1y * cy + e1z * cz
    f = 1.0 / jnp.where(live & (jnp.abs(det) >= EPSILON), det, 1.0)
    sx, sy, sz = ox - p1x, oy - p1y, oz - p1z
    u = f * (sx * cx + sy * cy + sz * cz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    outs = (t, u, v)
    if normals:
        w1 = 1.0 - u - v
        outs += tuple(w1 * g(9 + k) + u * g(12 + k) + v * g(15 + k)
                      for k in range(3))
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _kernel_closest(static, ro_c, rd_c, tri_comps, t_init, aux):
    """Pallas closest-hit with a custom VJP.

    Pallas TPU calls define no AD rule, so `jax.grad` through a mesh
    scene would fail on device; the backward pass recomputes the winning
    triangle's Möller–Trumbore partials in plain XLA (`_mt_winner_xla`)
    with the winner held locally constant. `static` = (use_bvh,
    interpret, leaf); t_init (cull seed) and aux (discrete payload
    columns) get zero gradients — the seed only gates culling and the
    payloads are integer ids."""
    from ..kernels import bvh as kbvh
    from ..kernels import triangles as ktri

    use_bvh, interpret, leaf = static
    if use_bvh:
        return kbvh.bvh_closest_triangle(ro_c, rd_c, tri_comps, dist=t_init,
                                         aux=aux, leaf=leaf,
                                         interpret=interpret)
    return ktri.closest_triangle(ro_c, rd_c, tri_comps, t_init=t_init,
                                 aux=aux, interpret=interpret)


def _kernel_closest_fwd(static, ro_c, rd_c, tri_comps, t_init, aux):
    outs = _kernel_closest(static, ro_c, rd_c, tri_comps, t_init, aux)
    return outs, (ro_c, rd_c, tri_comps, outs[0], outs[3], t_init, aux)


def _winner_segment_sum(cts, idx, T):
    """Sum per-ray cotangent rows into per-triangle rows WITHOUT XLA
    scatter: d_tbl[k][t] = sum over rays r with idx[r] == t of cts[k][r],
    computed as chunked one-hot matmuls on the MXU.

    The transpose of the per-element winner gather is a scatter-add,
    which TPUs execute at ~1 element/cycle — measured as 40 of the
    41.7 ms config4 mesh backward (round-5 bisection). A [CH, T] one-hot
    times the [K, CH] cotangent block is exact (0/1 weights select), and
    Precision.HIGHEST keeps the f32 cotangents unshaved (the default MXU
    precision truncates operands to bf16 — see CLAUDE.md)."""
    K = len(cts)
    R = cts[0].shape[0]
    dtype = cts[0].dtype
    g = jnp.stack(cts)                       # [K, R]
    CH = min(16384, -(-R // 8) * 8)
    pad = (-R) % CH
    if pad:
        g = jnp.pad(g, ((0, 0), (0, pad)))
        # Out-of-range index -> all-zero one-hot row (padding drops out).
        idx = jnp.pad(idx, (0, pad), constant_values=T)
    n = (R + pad) // CH
    gs = jnp.moveaxis(g.reshape(K, n, CH), 1, 0)   # [n, K, CH]
    ids = idx.reshape(n, CH)
    tt = jnp.arange(T, dtype=idx.dtype)

    def body(acc, xs):
        gc, ic = xs
        onehot = (ic[:, None] == tt[None, :]).astype(dtype)
        return acc + jax.lax.dot(gc, onehot,
                                 precision=jax.lax.Precision.HIGHEST), None

    acc, _ = jax.lax.scan(body, jnp.zeros((K, T), dtype), (gs, ids))
    return tuple(acc[k] for k in range(K))


def _kernel_closest_bwd(static, res, cts):
    ro_c, rd_c, tri_comps, t, idx, t_init, aux = res
    normals = len(tri_comps) == 18
    T = tri_comps[0].shape[0]
    idxc = jnp.clip(idx, 0, T - 1)
    live = jnp.isfinite(t)
    mask = lambda ct: jnp.where(live, ct, 0.0)
    # Output order: (t, u, v, idx[int], [nx, ny, nz], *aux) — the int
    # index carries a float0 cotangent and the aux payloads are discrete
    # ids cast to f32 (zero cotangent after the caller's int cast).
    prim_cts = (mask(cts[0]), mask(cts[1]), mask(cts[2]))
    if normals:
        prim_cts += tuple(mask(c) for c in cts[4:7])
    # Winner components via ONE row gather of the stacked [T, K] table
    # (~2 ns/index) instead of K per-element gathers (~12.7 ns/index
    # each); their cotangents return via the matmul segment-sum.
    rows = jnp.take(jnp.stack(tri_comps, axis=1), idxc, axis=0)
    gathered = tuple(rows[:, k] for k in range(len(tri_comps)))
    _, vjp = jax.vjp(
        functools.partial(_mt_winner_xla, live, normals),
        ro_c, rd_c, gathered)
    d_ro, d_rd, d_g = vjp(prim_cts)
    d_tri = _winner_segment_sum(d_g, idxc, T)
    d_tinit = None if t_init is None else jnp.zeros_like(t_init)
    d_aux = tuple(jnp.zeros_like(a) for a in aux)
    return d_ro, d_rd, d_tri, d_tinit, d_aux


_kernel_closest.defvjp(_kernel_closest_fwd, _kernel_closest_bwd)


def _pallas_triangle_best(scene: sd.SceneData, ro: V3, rd: V3, settings,
                          normals: bool = False, t_init=None):
    """Closest triangle hit via a fused Pallas kernel
    -> (t, u, v, prim, tri[, cls, (nx, ny, nz)]).

    Meshes with >= settings.bvh_min_tris triangles traverse the implicit
    LBVH (`kernels/bvh.py` — leaf data DMA'd from HBM, so mesh size is
    HBM-bounded); smaller ones use the VMEM-resident linear-chunk kernel
    (`kernels/triangles.py`, lower fixed cost). `t_init` ([R]) seeds the
    running best-t with the analytic-primitive hit so chunks/subtrees
    behind an already-found surface are culled. With normals=True the
    kernel also interpolates the winning triangle's world vertex normal
    and the shade class (both of which would otherwise cost serial
    per-ray gathers downstream).
    """
    T = scene.counts[6]
    R = ro.x.shape[0]
    interpret = getattr(settings, "pallas", "off") == "interpret"
    use_bvh = T >= getattr(settings, "bvh_min_tris", 1024)
    ro_c, rd_c, tri_lin, tri_bvh, aux_lin, aux_bvh, padr = (
        _pad_tri_kernel_inputs(scene, ro, rd, normals))
    seed = None if t_init is None else padr(t_init, fill=_INF)
    # The BVH bounds closest-hit traversal at min(best, dist): a subtree
    # is skipped iff entry is behind the seed — hits it does report are
    # exact, and seed-beaten leaves merge away below. `_kernel_closest`
    # wraps both kernels with the custom VJP (the seed gradient is zero
    # there; it only gates culling).
    leaf = int(getattr(settings, "bvh_leaf", 256))
    if use_bvh:
        outs = _kernel_closest((True, interpret, leaf), ro_c, rd_c,
                               tri_bvh, seed, aux_bvh)
    else:
        outs = _kernel_closest((False, interpret, leaf), ro_c, rd_c,
                               tri_lin, seed, aux_lin)
    t, u, v, idx = (o[:R] for o in outs[:4])
    # idx only feeds the rare textured-mesh uv gathers downstream — keep
    # it clamped for them; prim/cls come back from the kernel as f32
    # payload columns (misses carry 0, discarded by the caller's merge).
    idx = jnp.minimum(idx, T - 1)
    base = 7 if normals else 4
    prim = outs[base][:R].astype(jnp.int32)
    if not normals:
        return t, u, v, prim, idx
    cls = outs[base + 1][:R].astype(jnp.int32)
    tri_n = tuple(o[:R] for o in outs[4:7])
    return t, u, v, prim, idx, cls, tri_n


def _is_member(scene: sd.SceneData, pid: int) -> bool:
    ms = scene.csg_member_static
    return bool(ms[pid]) if pid < len(ms) else False


def member_pids(scene: sd.SceneData):
    """Prim ids that are operands of some CSG node (static)."""
    return tuple(p for p, m in enumerate(scene.csg_member_static) if m)


def csg_members_analytic(scene: sd.SceneData) -> bool:
    """True when every CSG operand is an analytic leaf (no mesh inside a
    CSG), enabling the hybrid path that sorts member slots only."""
    return all(scene.prim_kinds[p] != sd.TRIANGLE for p in member_pids(scene))


def closest_hit_soa(scene: sd.SceneData, ro: V3, rd: V3, settings,
                    skip_members: bool = False) -> Hit:
    """First t >= 0 hit across all primitives (fast path; no sorted list).

    skip_members=True restricts to prims outside every CSG (the hybrid
    CSG path merges in the filtered member hit separately)."""
    dtype = ro.dtype
    R = ro.x.shape
    # _like inits keep the fold state's varying-axis type tied to the
    # rays under shard_map (fresh constants are "unvarying" and trip
    # scan-carry typechecks in the chunked triangle fold).
    best_t = jnp.full_like(ro.x, _INF)
    zero = jnp.zeros_like(ro.x)
    best_prim = jnp.zeros_like(ro.x, dtype=jnp.int32)
    best_u = zero
    best_v = zero
    best_tri = jnp.zeros_like(ro.x, dtype=jnp.int32)
    best_cls = jnp.zeros_like(ro.x, dtype=jnp.int32)
    tri_n = None

    # prim -> class mapping is static, so the analytic unrolled loop
    # carries the class with scalar selects (no gather anywhere).
    cls_static = scene.prim_class_static

    for pid, (kind, row) in enumerate(zip(scene.prim_kinds,
                                          scene.prim_rows_static)):
        if kind == sd.TRIANGLE:
            continue
        if skip_members and _is_member(scene, pid):
            continue
        for t, valid in _leaf_slots(scene, kind, row, ro, rd):
            t = jnp.where(valid & (t >= 0.0), t, _INF)
            better = t < best_t
            best_t = jnp.where(better, t, best_t)
            best_prim = jnp.where(better, pid, best_prim)
            best_cls = jnp.where(better, cls_static[pid], best_cls)
            best_u = jnp.where(better, zero, best_u)
            best_v = jnp.where(better, zero, best_v)

    T = scene.counts[6]
    if T and _use_pallas(settings, dtype):
        ct, cu, cv, cp, ctri, ccls, cn = _pallas_triangle_best(
            scene, ro, rd, settings, normals=True, t_init=best_t)
        better = ct < best_t
        best_t = jnp.where(better, ct, best_t)
        best_prim = jnp.where(better, cp, best_prim)
        best_cls = jnp.where(better, ccls, best_cls)
        best_u = jnp.where(better, cu, best_u)
        best_v = jnp.where(better, cv, best_v)
        best_tri = jnp.where(better, ctri, best_tri)
        # Where a triangle won, its kernel-interpolated normal; analytic
        # winners are masked out downstream by type (zeros are safe).
        tri_n = tuple(jnp.where(better, c, 0.0) for c in cn)
    elif T:
        n_chunks, chunk, p1, e1, e2, pid, live = _tri_chunks(
            scene, min(settings.tri_chunk, max(T, 1)))

        if n_chunks == 1:
            args = (tuple(c[0] for c in p1), tuple(c[0] for c in e1),
                    tuple(c[0] for c in e2), pid[0], live[0])
            ct, cu, cv, cp, ctri = _tri_chunk_best(ro, rd, *args, base=0)
            better = ct < best_t
            best_t = jnp.where(better, ct, best_t)
            best_prim = jnp.where(better, cp, best_prim)
            best_u = jnp.where(better, cu, best_u)
            best_v = jnp.where(better, cv, best_v)
            best_tri = jnp.where(better, ctri, best_tri)
        else:
            def body(carry, xs):
                bt, bp, bu, bv, btr = carry
                ci, cp1, ce1, ce2, cpid, clive = xs
                ct, cu, cv, cp, ctri = _tri_chunk_best(
                    ro, rd, cp1, ce1, ce2, cpid, clive, base=ci * chunk)
                better = ct < bt
                return (jnp.where(better, ct, bt),
                        jnp.where(better, cp, bp),
                        jnp.where(better, cu, bu),
                        jnp.where(better, cv, bv),
                        jnp.where(better, ctri, btr)), None

            xs = (jnp.arange(n_chunks), p1, e1, e2, pid, live)
            (best_t, best_prim, best_u, best_v, best_tri), _ = jax.lax.scan(
                body, (best_t, best_prim, best_u, best_v, best_tri), xs)

    if T and not _use_pallas(settings, dtype):
        # XLA fallback (CPU oracle path): derive the class with a plain
        # gather — cheap off-TPU, and tri_n stays None so normal_at uses
        # the table interpolation.
        best_cls = jnp.take(scene.prim_class, best_prim)

    return Hit(found=jnp.isfinite(best_t), t=best_t, prim=best_prim,
               u=best_u, v=best_v, tri=best_tri, cls=best_cls, tri_n=tri_n)


# ---------------------------------------------------------------------------
# Sorted slot list (SoA): for CSG filtering and the refraction n1/n2 walk.
# Analytic scenes only (triangle meshes fall back to the AoS top-K path).
# ---------------------------------------------------------------------------

def sorted_slots_soa(scene: sd.SceneData, ro: V3, rd: V3):
    """All analytic hit slots sorted ascending by t as [K, R] arrays
    (t, prim, valid) — rays in the minor (lane) axis, slots in the major
    axis, so lax.sort(dimension=0) is a per-ray K-element sort with full
    lane utilization (the SoA replacement for scene.rs:97-106). lax.sort
    is stable, preserving insertion order on ties like the reference's
    Vec sort."""
    R = ro.x.shape
    ts, prims = [], []
    for pid, (kind, row) in enumerate(zip(scene.prim_kinds,
                                          scene.prim_rows_static)):
        assert kind != sd.TRIANGLE, "use sorted_slots_full_soa for meshes"
        for t, valid in _leaf_slots(scene, kind, row, ro, rd):
            ts.append(jnp.where(valid, t, _INF))
            prims.append(jnp.full(R, pid, jnp.int32))
    # Odd-even transposition network over the K slot lists: K rounds of
    # elementwise compare-swaps on [R] pairs. Beats lax.sort along the
    # major axis by a wide margin on TPU for the small analytic K, and
    # strict > keeps ties stable like the reference's Vec sort.
    K = len(ts)
    for rnd in range(K):
        for i in range(rnd % 2, K - 1, 2):
            swap = ts[i] > ts[i + 1]
            ta = jnp.where(swap, ts[i + 1], ts[i])
            tb = jnp.where(swap, ts[i], ts[i + 1])
            pa = jnp.where(swap, prims[i + 1], prims[i])
            pb = jnp.where(swap, prims[i], prims[i + 1])
            ts[i], ts[i + 1] = ta, tb
            prims[i], prims[i + 1] = pa, pb
    t = jnp.stack(ts, axis=0)
    prim = jnp.stack(prims, axis=0)
    return t, prim, jnp.isfinite(t)


def sorted_member_slots(scene: sd.SceneData, ro: V3, rd: V3):
    """Sorted [K, R] slots over CSG-MEMBER prims only.

    CSG filtering (csg.rs:177-195) depends only on slots whose prim lies
    under some CSG node: non-member slots are always kept and never
    toggle the in-left/in-right state. So the hybrid path sorts this
    small analytic subset (a compare-swap network like sorted_slots_soa)
    and leaves everything else on the sort-free fast path."""
    R = ro.x.shape
    ts, prims = [], []
    for pid in member_pids(scene):
        kind = scene.prim_kinds[pid]
        row = scene.prim_rows_static[pid]
        assert kind != sd.TRIANGLE, "hybrid CSG path requires analytic members"
        for t, valid in _leaf_slots(scene, kind, row, ro, rd):
            ts.append(jnp.where(valid, t, _INF))
            prims.append(jnp.full(R, pid, jnp.int32))
    K = len(ts)
    for rnd in range(K):
        for i in range(rnd % 2, K - 1, 2):
            swap = ts[i] > ts[i + 1]
            ta = jnp.where(swap, ts[i + 1], ts[i])
            tb = jnp.where(swap, ts[i], ts[i + 1])
            pa = jnp.where(swap, prims[i + 1], prims[i])
            pb = jnp.where(swap, prims[i], prims[i + 1])
            ts[i], ts[i + 1] = ta, tb
            prims[i], prims[i + 1] = pa, pb
    t = jnp.stack(ts, axis=0)
    prim = jnp.stack(prims, axis=0)
    return t, prim, jnp.isfinite(t)


def _member_slots_filtered_nosort(scene: sd.SceneData, ro: V3, rd: V3):
    """CSG-filtered member slots WITHOUT sorting (hybrid fast path).

    The reference's filter (csg.rs:177-195) scans the slots in sorted
    order carrying in-left/in-right parities — but each slot's parity
    state is just the parity of *other* valid operand crossings that
    precede it in that order, which is computable per slot from pairwise
    comparisons: slot j precedes slot i iff t_j < t_i, or t_j == t_i and
    j was inserted earlier (lax.sort/Vec-sort tie stability). Because
    every slot's prim — hence its side under each CSG — is STATIC, the
    per-slot allowed rule reduces to one or two XOR parities of a couple
    of masked comparisons, replacing the K-round compare-swap network +
    per-node lax.scan + K-select pass (measured ~45% of the 1080p CSG
    frame's node eval).

    Returns (ts, pids, keeps): lists of [R] slot arrays (UNSORTED) with
    static prim ids; `keeps` marks slots that survive every CSG filter,
    innermost-first like apply_csg_soa."""
    ts, pids, valids = [], [], []
    for pid in member_pids(scene):
        kind = scene.prim_kinds[pid]
        row = scene.prim_rows_static[pid]
        assert kind != sd.TRIANGLE, "hybrid CSG path requires analytic members"
        for t, valid in _leaf_slots(scene, kind, row, ro, rd):
            ts.append(t)
            pids.append(pid)
            valids.append(valid)
    ops_and_sides = tuple(
        (op, tuple(scene.csg_side_static[ci][pid] for pid in pids))
        for ci, op in enumerate(scene.csg_ops))
    return ts, pids, csg_keeps(ts, valids, ops_and_sides)


def csg_keeps(ts, valids, ops_and_sides):
    """The static pairwise-parity CSG filter over UNSORTED slot lists.

    `ts`/`valids`: per-slot [R] arrays; `ops_and_sides`: innermost-first
    tuple of (op, per-slot side code tuple) with side in {0: not under
    this CSG, 1: left, 2: right}. Pure jnp elementwise math — shared by
    the XLA hybrid path AND the fused whitted kernel (traced in-register
    there), so the filter semantics (csg.rs:163-195) cannot drift
    between them."""
    K = len(ts)
    # before[j][i]: slot j precedes slot i in the stable sorted order.
    before = [[None] * K for _ in range(K)]
    for j in range(K):
        for i in range(K):
            if i == j:
                continue
            before[j][i] = (ts[j] <= ts[i]) if j < i else (ts[j] < ts[i])

    for op, side in ops_and_sides:
        keeps = []
        for i in range(K):
            if side[i] == 0:
                keeps.append(valids[i])  # not under this CSG: always kept
                continue
            parity = {1: None, 2: None}
            for j in range(K):
                if j == i or side[j] == 0:
                    continue
                x = valids[j] & before[j][i]
                parity[side[j]] = x if parity[side[j]] is None \
                    else parity[side[j]] ^ x
            inl = parity[1] if parity[1] is not None else jnp.zeros_like(
                valids[i])
            inr = parity[2] if parity[2] is not None else jnp.zeros_like(
                valids[i])
            if op == sd.CSG_UNION:
                allowed = ~inr if side[i] == 1 else ~inl
            elif op == sd.CSG_INTERSECTION:
                allowed = inr if side[i] == 1 else inl
            else:  # difference
                allowed = ~inr if side[i] == 1 else inl
            keeps.append(valids[i] & allowed)
        valids = keeps
    return valids


def csg_filtered_member_hit(scene: sd.SceneData, ro: V3, rd: V3):
    """Hybrid-path CSG evaluation: filtered member slots ->
    (found, t, prim) of the minimal surviving t >= 0 slot (== the first
    surviving slot of the sorted order; strict < keeps the earlier-
    inserted slot on ties like the stable sort), plus the filtered
    slots as [K, R] stacks (for the n1/n2 walk, which is order-free)."""
    ts, pids, keeps = _member_slots_filtered_nosort(scene, ro, rd)
    R = ro.x.shape
    found = jnp.zeros(R, bool)
    t_out = jnp.full(R, _INF, ro.dtype)
    prim_out = jnp.zeros(R, jnp.int32)
    for t, pid, keep in zip(ts, pids, keeps):
        take = keep & (t >= 0.0) & (t < t_out)
        t_out = jnp.where(take, t, t_out)
        prim_out = jnp.where(take, pid, prim_out)
        found = found | take
    t_out = jnp.where(found, t_out, 0.0)
    mslots = (jnp.stack(ts), jnp.stack([jnp.full(R, p, jnp.int32)
                                        for p in pids]), jnp.stack(keeps))
    return found, t_out, prim_out, mslots


def closest_hit_hybrid(scene: sd.SceneData, ro: V3, rd: V3, settings):
    """Closest hit for CSG scenes whose operands are all analytic:
    fast masked-min over non-member prims + meshes, merged with the
    CSG-filtered member hit. Returns (Hit, filtered member slots)."""
    hit = closest_hit_soa(scene, ro, rd, settings, skip_members=True)
    mfound, mt, mprim, mslots = csg_filtered_member_hit(scene, ro, rd)
    better = mfound & (mt < hit.t)
    zero = jnp.zeros_like(hit.u)
    # Carry the class id through the merge (member prim -> class is
    # static, a few selects) so downstream shading keeps the gather-free
    # ClassReader; tri_n passes through untouched — members are analytic
    # (csg_members_analytic gates this path), so rays where a member won
    # never read the triangle normal lanes.
    mcls = jnp.zeros_like(hit.cls)
    for pid in member_pids(scene):
        mcls = jnp.where(mprim == pid, scene.prim_class_static[pid], mcls)
    merged = Hit(found=hit.found | mfound,
                 t=jnp.where(better, mt, hit.t),
                 prim=jnp.where(better, mprim, hit.prim),
                 u=jnp.where(better, zero, hit.u),
                 v=jnp.where(better, zero, hit.v),
                 tri=jnp.where(better, 0, hit.tri),
                 cls=jnp.where(better, mcls, hit.cls),
                 tri_n=hit.tri_n)
    return merged, mslots


def sorted_slots_full_soa(scene: sd.SceneData, ro: V3, rd: V3, settings):
    """Sorted slots incl. triangle meshes: [K, R] arrays
    (t, prim, valid, u, v, tri).

    Analytic leaves contribute their closed-form slots; triangles
    contribute a per-ray top-K_tri prefix extracted chunk-by-chunk under
    lax.scan (K_tri masked argmin extractions per chunk, merged into the
    running prefix with one stable sort per chunk). K_tri bounds how many
    triangle interfaces a refraction/CSG walk can cross before the hit —
    settings.max_hits, matching the AoS path's top-K semantics.
    """
    R = ro.x.shape
    dtype = ro.dtype
    ts, prims = [], []
    for pid, (kind, row) in enumerate(zip(scene.prim_kinds,
                                          scene.prim_rows_static)):
        if kind == sd.TRIANGLE:
            continue
        for t, valid in _leaf_slots(scene, kind, row, ro, rd):
            ts.append(jnp.where(valid, t, _INF))
            prims.append(jnp.full(R, pid, jnp.int32))
    Ka = len(ts)
    t = jnp.stack(ts, axis=0) if Ka else jnp.zeros((0,) + R, dtype)
    prim = (jnp.stack(prims, axis=0) if Ka
            else jnp.zeros((0,) + R, jnp.int32))
    zeros = jnp.zeros_like(t)
    u = zeros
    v = zeros
    tri = jnp.zeros_like(prim)

    T = scene.counts[6]
    if T:
        K_tri = min(settings.max_hits, T)
        n_chunks, chunk, p1, e1, e2, pid_tbl, live = _tri_chunks(
            scene, min(settings.tri_chunk, max(T, 1)))

        def chunk_topk(cp1, ce1, ce2, cpid, clive, base):
            # Full [R, C] MT evaluation, then K_tri masked extractions.
            tt, uu, vv, ok = _tri_chunk_eval(ro, rd, cp1, ce1, ce2)
            tt = jnp.where(ok & clive[None, :], tt, _INF)
            outs = []
            for _ in range(K_tri):
                idx = jnp.argmin(tt, axis=1).astype(jnp.int32)
                take = lambda a: jnp.take_along_axis(
                    a, idx[:, None], axis=1)[:, 0]
                outs.append((take(tt), take(uu), take(vv),
                             cpid[idx], (base + idx).astype(jnp.int32)))
                tt = jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, tt.shape, 1)
                    == idx[:, None], _INF, tt)
            stack = lambda i: jnp.stack([o[i] for o in outs], axis=0)
            return stack(0), stack(1), stack(2), stack(3), stack(4)

        if n_chunks == 1:
            tri_t, tri_u, tri_v, tri_p, tri_i = chunk_topk(
                tuple(c[0] for c in p1), tuple(c[0] for c in e1),
                tuple(c[0] for c in e2), pid_tbl[0], live[0], 0)
        else:
            def body(carry, xs):
                bt, bu, bv, bp, bi = carry
                ci, cp1, ce1, ce2, cpid, clive = xs
                ct, cu, cv, cp, cidx = chunk_topk(cp1, ce1, ce2, cpid,
                                                  clive, ci * chunk)
                mt = jnp.concatenate([bt, ct], axis=0)
                mu_ = jnp.concatenate([bu, cu], axis=0)
                mv = jnp.concatenate([bv, cv], axis=0)
                mp = jnp.concatenate([bp, cp], axis=0)
                mi = jnp.concatenate([bi, cidx], axis=0)
                mt, mp, mu_, mv, mi = jax.lax.sort(
                    (mt, mp, mu_, mv, mi), dimension=0, num_keys=1,
                    is_stable=True)
                return (mt[:K_tri], mu_[:K_tri], mv[:K_tri], mp[:K_tri],
                        mi[:K_tri]), None

            # Carry init derives from the rays (varying under shard_map).
            zf = jnp.broadcast_to((ro.x * 0.0)[None], (K_tri,) + R)
            zi = zf.astype(jnp.int32)
            init = (zf + _INF, zf, zf, zi, zi)
            xs = (jnp.arange(n_chunks), p1, e1, e2, pid_tbl, live)
            (tri_t, tri_u, tri_v, tri_p, tri_i), _ = jax.lax.scan(
                body, init, xs)

        t = jnp.concatenate([t, tri_t], axis=0)
        u = jnp.concatenate([u, tri_u], axis=0)
        v = jnp.concatenate([v, tri_v], axis=0)
        prim = jnp.concatenate([prim, tri_p], axis=0)
        tri = jnp.concatenate([tri, tri_i], axis=0)

    t, prim, u, v, tri = jax.lax.sort((t, prim, u, v, tri), dimension=0,
                                      num_keys=1, is_stable=True)
    return t, prim, jnp.isfinite(t), u, v, tri


def _tri_chunk_eval(ro: V3, rd: V3, p1, e1, e2):
    """Raw [R, C] Möller–Trumbore values (t, u, v, ok) for one chunk."""
    dx, dy, dz = rd.x[:, None], rd.y[:, None], rd.z[:, None]
    ox, oy, oz = ro.x[:, None], ro.y[:, None], ro.z[:, None]
    e1x, e1y, e1z = e1[0][None, :], e1[1][None, :], e1[2][None, :]
    e2x, e2y, e2z = e2[0][None, :], e2[1][None, :], e2[2][None, :]
    p1x, p1y, p1z = p1[0][None, :], p1[1][None, :], p1[2][None, :]
    cx = dy * e2z - dz * e2y
    cy = dz * e2x - dx * e2z
    cz = dx * e2y - dy * e2x
    det = e1x * cx + e1y * cy + e1z * cz
    ok = jnp.abs(det) >= EPSILON
    f = 1.0 / jnp.where(ok, det, 1.0)
    sx = ox - p1x
    sy = oy - p1y
    sz = oz - p1z
    u = f * (sx * cx + sy * cy + sz * cz)
    ok = ok & (u >= 0.0) & (u <= 1.0)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    ok = ok & (v >= 0.0) & (u + v <= 1.0)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    return t, u, v, ok


def apply_csg_soa(scene: sd.SceneData, slots):
    """Replay filter_intersections (csg.rs:177-195) per CSG node over the
    sorted [K, R] slots, innermost first. Dropped slots keep their t (for
    ordering) but lose validity.

    One lax.scan over the slot axis per CSG node, carrying the in-left/
    in-right parities — the graph holds one ~10-op body per node instead
    of K unrolled copies, so compile time is flat in max_hits.
    """
    t, prim, valid = slots[:3]
    extra = slots[3:]
    R = t.shape[1:]
    for ci, op in enumerate(scene.csg_ops):
        side_table = scene.csg_side[ci]

        def body(carry, xs, op=op, side_table=side_table):
            inl, inr = carry
            prim_k, valid_k = xs
            s = jnp.where(valid_k, take_rows(side_table, prim_k), 0)
            lhit = s == 1
            under = s > 0
            if op == sd.CSG_UNION:
                allowed = (lhit & ~inr) | (~lhit & ~inl)
            elif op == sd.CSG_INTERSECTION:
                allowed = (lhit & inr) | (~lhit & inl)
            else:
                allowed = (lhit & ~inr) | (~lhit & inl)
            keep = valid_k & (~under | allowed)
            return (inl ^ lhit, inr ^ (s == 2)), keep

        # Carry init derives from the slot arrays so its varying-axis
        # type matches the body output under shard_map.
        zb = valid[0] & False
        _, valid = jax.lax.scan(body, (zb, zb), (prim, valid))
    return (t, prim, valid) + tuple(extra)


def select_hit_slots(slots):
    """First valid slot with t >= 0 (scene.rs:128-136). Returns
    (found[R], t[R], prim[R], hit_slot_index[R]) for 3-tuple slots, plus
    (u, v, tri) when the slots carry them (6-tuple form).

    Static K-loop of elementwise selects — axis-0 argmax/gather over
    [K, R] runs ~40x slower on TPU than K fused [R] passes."""
    t, prim, valid = slots[:3]
    K = t.shape[0]
    R = t.shape[1:]
    found = jnp.zeros(R, bool)
    t_out = jnp.zeros(R, t.dtype)
    prim_out = jnp.zeros(R, jnp.int32)
    idx_out = jnp.zeros(R, jnp.int32)
    extras = [jnp.zeros(R, a.dtype) for a in slots[3:6]]
    for k in range(K):
        take = ~found & valid[k] & (t[k] >= 0.0)
        t_out = jnp.where(take, t[k], t_out)
        prim_out = jnp.where(take, prim[k], prim_out)
        idx_out = jnp.where(take, k, idx_out)
        for i, a in enumerate(slots[3:6]):
            extras[i] = jnp.where(take, a[k], extras[i])
        found = found | take
    if extras:
        return (found, t_out, prim_out, idx_out) + tuple(extras)
    return found, t_out, prim_out, idx_out


def refractive_indices_soa(scene: sd.SceneData, slots, hit_idx, depth=8):
    """n1/n2 containers walk (intersection.rs:61-92) as ONE lax.scan.

    The reference keeps an ordered container list: append the prim on
    enter, remove-by-value on exit, and read the LAST element (the
    innermost) just before and just after processing the hit's own slot.
    Here the list is an explicit [D, R] stack carried through a scan over
    the K sorted slots (rays stay in lanes): membership test, remove-with-
    shift, and push are each D masked elementwise ops, so the graph is one
    O(D) body instead of the old O(K^2)..O(K^3) unrolled reductions and
    the work is O(K*D*R). The stack is floored at the scene's prim count:
    the containers list toggles membership per prim (the reference's
    remove-by-value, intersection.rs:75-82), so it can never hold more
    entries than there are prims — with D >= P overflow is unreachable
    and the walk is exact for ANY nesting depth. (Without the floor, a
    full-stack enter was dropped and its later exit mis-pushed as an
    enter.) Capped at 64 to bound graph size on pathological scenes."""
    t, prim, valid = slots[:3]
    K = t.shape[0]
    R = t.shape[1:]
    dtype = t.dtype
    D = max(int(depth) if depth else 8, 1)
    D = min(max(D, int(scene.counts[7])), 64)
    one = jnp.asarray(1.0, dtype)

    # is_hit[k] = (k == hit_idx), shaped [K, R].
    karange = jnp.arange(K).reshape((K,) + (1,) * len(R))
    is_hit = karange == hit_idx[None]

    def top_ior(stack, size):
        top = jnp.zeros(R, jnp.int32)
        for d in range(D):
            top = jnp.where(size == d + 1, stack[d], top)
        return jnp.where(size > 0, take_rows(scene.mat_ior, top), one)

    def body(carry, xs):
        stack, size, n1, n2 = carry
        prim_k, valid_k, hit_k = xs
        n1 = jnp.where(hit_k, top_ior(stack, size), n1)
        match = [(stack[d] == prim_k) & (d < size) for d in range(D)]
        found = jnp.zeros(R, bool)
        for m in match:
            found = found | m
        new_rows = []
        shift = jnp.zeros(R, bool)
        for d in range(D):
            shift = shift | match[d]
            above = stack[d + 1] if d + 1 < D else jnp.zeros(R, jnp.int32)
            removed = jnp.where(shift, above, stack[d])
            pushed = jnp.where(d == size, prim_k, stack[d])
            new_rows.append(jnp.where(valid_k,
                                      jnp.where(found, removed, pushed),
                                      stack[d]))
        stack = jnp.stack(new_rows, axis=0)
        size = jnp.where(valid_k,
                         jnp.where(found, size - 1, jnp.minimum(size + 1, D)),
                         size)
        n2 = jnp.where(hit_k, top_ior(stack, size), n2)
        return (stack, size, n1, n2), None

    # Carry init derives from the slot arrays (varying under shard_map).
    zi = prim[0] * 0
    onev = t[0] * 0.0 + 1.0
    init = (jnp.stack([zi] * D, axis=0), zi, onev, onev)
    (_, _, n1, n2), _ = jax.lax.scan(body, init, (prim, valid, is_hit))
    return n1, n2


def refractive_indices_direct(scene: sd.SceneData, ro: V3, rd: V3,
                              t_hit, hit_prim, settings, member_slots=None):
    """n1/n2 without any sorted slot list (non-CSG scenes).

    Equivalent to the containers walk (intersection.rs:61-92): a prim is
    a container at the hit iff it has an odd number of crossings strictly
    before t_hit, and the innermost container is the one whose latest
    crossing (its entry) is largest in t. Both are per-leaf masked
    reductions over that leaf's own hit slots — no inter-slot ordering
    needed. Triangles cross a ray at most once, so a mesh contributes a
    single chunked max-merge.

    n2 repeats the computation including the hit crossing itself; at the
    hit slot the hit prim toggles, which the <=/strict split captures
    (exact-t ties between different prims are resolved by t rather than
    sort order — measure-zero vs the reference).
    """
    dtype = ro.dtype
    R = ro.x.shape
    neg = jnp.asarray(-jnp.inf, dtype)
    # The hit's own crossing is matched by (prim, ~t) rather than exact t:
    # re-deriving the crossing re-fuses the arithmetic, so bitwise
    # equality with the closest-hit t is not guaranteed.
    tol = (1e-9 if dtype == jnp.float64 else 1e-4) \
        * jnp.maximum(1.0, jnp.abs(t_hit))

    def fold(best_t, best_prim, cand_t, cand_ok, pid):
        better = cand_ok & (cand_t > best_t)
        return (jnp.where(better, cand_t, best_t),
                jnp.where(better, pid, best_prim))

    # One pass over every leaf's slots computes BOTH prefixes: strict
    # (crossings before the hit -> n1) and loose (through the hit -> n2)
    # differ only in whether the hit's own crossing counts, so the
    # expensive part — evaluating each leaf's closed-form slots (quartic
    # for tori, affine transforms everywhere) — is shared.
    best_t_s = jnp.full(R, neg, dtype)
    best_prim_s = jnp.zeros(R, jnp.int32)
    best_t_l = jnp.full(R, neg, dtype)
    best_prim_l = jnp.zeros(R, jnp.int32)
    def accumulate(pid, slot_list):
        """Fold one prim's crossings (list of (t, valid)) into both the
        strict (n1) and loose (n2) innermost-container candidates."""
        nonlocal best_t_s, best_prim_s, best_t_l, best_prim_l
        cnt_s = jnp.zeros(R, jnp.int32)
        last_s = jnp.full(R, neg, dtype)
        cnt_l = jnp.zeros(R, jnp.int32)
        last_l = jnp.full(R, neg, dtype)
        for t, valid in slot_list:
            is_hit = (hit_prim == pid) & (jnp.abs(t - t_hit) <= tol)
            before = valid & (t < t_hit)
            in_s = before & ~is_hit
            in_l = before | (valid & is_hit)
            cnt_s = cnt_s + in_s.astype(jnp.int32)
            last_s = jnp.maximum(last_s, jnp.where(in_s, t, neg))
            cnt_l = cnt_l + in_l.astype(jnp.int32)
            last_l = jnp.maximum(last_l, jnp.where(in_l, t, neg))
        best_t_s, best_prim_s = fold(best_t_s, best_prim_s, last_s,
                                     (cnt_s % 2) == 1, pid)
        best_t_l, best_prim_l = fold(best_t_l, best_prim_l, last_l,
                                     (cnt_l % 2) == 1, pid)

    for pid, (kind, row) in enumerate(zip(scene.prim_kinds,
                                          scene.prim_rows_static)):
        if kind == sd.TRIANGLE:
            continue
        if member_slots is not None and _is_member(scene, pid):
            continue  # counted below from the CSG-filtered slots
        accumulate(pid, _leaf_slots(scene, kind, row, ro, rd))

    if member_slots is not None:
        # CSG operands toggle containers only through slots that SURVIVE
        # the CSG filter (the reference's xs holds filtered CSG output).
        mt, mprim, mvalid = member_slots[:3]
        for pid in member_pids(scene):
            slot_list = [(mt[k], mvalid[k] & (mprim[k] == pid))
                         for k in range(mt.shape[0])]
            accumulate(pid, slot_list)

    T = scene.counts[6]
    if T:
        n_chunks, chunk, p1, e1, e2, pid_tbl, live = _tri_chunks(
            scene, min(settings.tri_chunk, max(T, 1)))

        def chunk_fold(carry, xs):
            bts, bps, btl, bpl = carry
            cp1, ce1, ce2, cpid = xs
            tt, _, _, ok = _tri_chunk_eval(ro, rd, cp1, ce1, ce2)
            is_hit = ((cpid[None, :] == hit_prim[:, None])
                      & (jnp.abs(tt - t_hit[:, None]) <= tol[:, None]))
            before = ok & (tt < t_hit[:, None])

            def reduce_max(okp):
                ttm = jnp.where(okp, tt, -_INF)
                idx = jnp.argmax(ttm, axis=1).astype(jnp.int32)
                col = jax.lax.broadcasted_iota(jnp.int32, ttm.shape, 1)
                onehot = col == idx[:, None]
                ct = jnp.max(ttm, axis=1)
                cp = jnp.sum(jnp.where(onehot, cpid[None, :], 0), axis=1,
                             dtype=jnp.int32)
                return ct, cp

            cts, cps = reduce_max(before & ~is_hit)
            ctl, cpl = reduce_max(before | (ok & is_hit))
            bts, bps = fold(bts, bps, cts, jnp.isfinite(cts), cps)
            btl, bpl = fold(btl, bpl, ctl, jnp.isfinite(ctl), cpl)
            return (bts, bps, btl, bpl), None

        live_pid = jnp.where(live, pid_tbl, -1)
        carry = (best_t_s, best_prim_s, best_t_l, best_prim_l)
        if n_chunks == 1:
            carry, _ = chunk_fold(
                carry, (tuple(c[0] for c in p1), tuple(c[0] for c in e1),
                        tuple(c[0] for c in e2), live_pid[0]))
        else:
            carry, _ = jax.lax.scan(chunk_fold, carry,
                                    (p1, e1, e2, live_pid))
        best_t_s, best_prim_s, best_t_l, best_prim_l = carry

    def to_ior(best_t, best_prim):
        have = jnp.isfinite(best_t)
        ior = take_rows(scene.mat_ior, jnp.maximum(best_prim, 0))
        return jnp.where(have, ior, jnp.asarray(1.0, dtype))

    return to_ior(best_t_s, best_prim_s), to_ior(best_t_l, best_prim_l)


def any_hit_hybrid(scene: sd.SceneData, ro: V3, rd: V3, distance, settings):
    """Shadow test for CSG scenes whose operands are all analytic: fast
    any-hit over non-member prims + meshes, OR'd with any surviving
    CSG-filtered member slot in range (scene.rs:234-245 semantics —
    the scene's intersection list holds the CSG's *filtered* output)."""
    hit = any_hit_soa(scene, ro, rd, distance, settings, skip_members=True)
    ts, _, keeps = _member_slots_filtered_nosort(scene, ro, rd)
    for t, keep in zip(ts, keeps):
        hit = hit | (keep & (t >= 0.0) & (t < distance))
    return hit


def any_hit_sorted_soa(scene: sd.SceneData, ro: V3, rd: V3, distance,
                       settings=None):
    """Shadow test honoring CSG filtering (scene.rs:234-245)."""
    if scene.counts[6] and settings is not None:
        slots = sorted_slots_full_soa(scene, ro, rd, settings)
    else:
        slots = sorted_slots_soa(scene, ro, rd)
    filtered = apply_csg_soa(scene, slots)
    t, _, valid = filtered[:3]
    return jnp.any(valid & (t >= 0.0) & (t < distance[None, :]), axis=0)


def _sphere_occludes_local(o: V3, d: V3, dist):
    """Root of the unit-sphere quadratic in [0, dist)? sqrt/div-free.

    Sign tests on b, c, f(dist) and b + 2a*dist decide root membership
    exactly (a > 0; fuzz-pinned against the slot form in f32 and f64) —
    sqrt and divide are the multi-cycle VPU ops in an area light's
    25-samples-per-pixel shadow loop."""
    a = d.dot(d)
    b = 2.0 * d.dot(o)
    c = o.dot(o) - 1.0
    ok = b * b - 4.0 * a * c >= 0.0  # real roots
    fd = (a * dist + b) * dist + c   # f(dist)
    s2 = b + 2.0 * a * dist
    tm_in = (b <= 0.0) & (c >= 0.0) & ((s2 > 0.0) | (fd < 0.0))
    tp_in = ((b <= 0.0) | (c <= 0.0)) & (s2 > 0.0) & (fd > 0.0)
    return ok & (tm_in | tp_in)


def _plane_occludes_local(o: V3, d: V3, dist):
    """xz-plane crossing in [0, dist)? The t = -oy/dy range test
    multiplied through by dy^2 — no divide."""
    oy_dy = o.y * d.y
    return ((jnp.abs(d.y) >= EPSILON) & (oy_dy <= 0.0)
            & (-oy_dy < dist * d.y * d.y))


def _leaf_occludes(scene: sd.SceneData, kind: int, row: int, ro: V3, rd: V3,
                   dist):
    """Does this leaf have a hit with 0 <= t < dist? (shadow predicate)

    Spheres and planes get sqrt/div-free interval forms; other shapes
    reuse their slot forms."""
    if kind == sd.SPHERE:
        inv = scene.sph_inv[row]
        return _sphere_occludes_local(affine_point(inv, ro),
                                      affine_vector(inv, rd), dist)
    if kind == sd.PLANE:
        inv = scene.pla_inv[row]
        return _plane_occludes_local(affine_point(inv, ro),
                                     affine_vector(inv, rd), dist)
    hit = jnp.zeros(ro.x.shape, bool)
    for t, valid in _leaf_slots(scene, kind, row, ro, rd):
        hit = hit | (valid & (t >= 0.0) & (t < dist))
    return hit


def _occlusion_params(scene: sd.SceneData, pids):
    """[len(pids), 16] param table for kernels/analytic.py: 12 affine
    coefficients + ymin/ymax/closed extras (zeros elsewhere)."""
    from ..kernels import analytic as kanl

    rows = []
    zero3 = jnp.zeros((3,), jnp.float32)
    for pid in pids:
        kind = scene.prim_kinds[pid]
        row = scene.prim_rows_static[pid]
        if kind == sd.SPHERE:
            inv, extra = scene.sph_inv[row], zero3
        elif kind == sd.PLANE:
            inv, extra = scene.pla_inv[row], zero3
        elif kind == sd.CUBE:
            inv, extra = scene.cub_inv[row], zero3
        elif kind == sd.CYLINDER:
            inv = scene.cyl_inv[row]
            extra = jnp.stack([scene.cyl_min[row], scene.cyl_max[row],
                               scene.cyl_closed[row].astype(jnp.float32)])
        else:
            inv = scene.con_inv[row]
            extra = jnp.stack([scene.con_min[row], scene.con_max[row],
                               scene.con_closed[row].astype(jnp.float32)])
        rows.append(jnp.concatenate([inv.reshape(-1).astype(jnp.float32),
                                     extra.astype(jnp.float32),
                                     jnp.zeros((kanl.N_PARAMS - 15,),
                                               jnp.float32)]))
    return jnp.stack(rows)


def any_hit_soa(scene: sd.SceneData, ro: V3, rd: V3, distance, settings,
                skip_members: bool = False):
    """Shadow test: any hit with 0 <= t < distance (scene.rs:234-245).

    Stays in XLA: a per-call Pallas kernel was tried and measured 8x
    WORSE on the sphere frame — one occlusion test is ~40 flops/ray, so
    the kernel's input/output materialization and per-block dispatch
    swamp the work. The fused kernel that pays off is the whole
    area-light sample LOOP (kernels/analytic.py), one call per tile."""
    hit = jnp.zeros_like(ro.x, dtype=bool)
    for pid, (kind, row) in enumerate(zip(scene.prim_kinds,
                                          scene.prim_rows_static)):
        if kind == sd.TRIANGLE:
            continue
        if skip_members and _is_member(scene, pid):
            continue
        hit = hit | _leaf_occludes(scene, kind, row, ro, rd, distance)

    T = scene.counts[6]
    if T and _use_pallas(settings, ro.dtype):
        hit = hit | _pallas_triangle_any(scene, ro, rd, settings, distance)
    elif T:
        n_chunks, chunk, p1, e1, e2, pid, live = _tri_chunks(
            scene, min(settings.tri_chunk, max(T, 1)))

        def chunk_any(cp1, ce1, ce2, clive):
            tt, _, _, ok = _tri_chunk_eval(ro, rd, cp1, ce1, ce2)
            ok = ok & clive[None, :] & (tt >= 0.0) & (tt < distance[:, None])
            return jnp.any(ok, axis=1)

        if n_chunks == 1:
            hit = hit | chunk_any(tuple(c[0] for c in p1),
                                  tuple(c[0] for c in e1),
                                  tuple(c[0] for c in e2), live[0])
        else:
            def body(acc, xs):
                cp1, ce1, ce2, clive = xs
                return acc | chunk_any(cp1, ce1, ce2, clive), None

            hit, _ = jax.lax.scan(body, hit, (p1, e1, e2, live))
    return hit
