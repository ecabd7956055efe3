"""Surface normals and UV mappings for the selected hit.

`normal_at` mirrors the reference dispatch (object.rs:52-56): transform the
world point into object space with the composed inverse, evaluate the
type-specific local normal, then map back through the composed
inverse-transpose and normalize. Triangles are stored in world space, so
their normals come straight from the (pre-transformed) triangle tables.

UV mappings mirror each shape's uv_mapping (sphere.rs:126-132,
plane.rs:105-113, cube.rs:132-174, cylinder.rs:181-196, cone.rs:232-255,
torus.rs:150-161, triangle.rs:148-170). They operate on pattern-space
points, exactly as Texture patterns do (pattern.rs:209-213).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import EPSILON
from ..scene import data as sd


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(v):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, 1e-30)


def _gather_rows(table, rows):
    if table.shape[0] == 0:
        return jnp.zeros(rows.shape + table.shape[1:], table.dtype)
    return table[jnp.clip(rows, 0, table.shape[0] - 1)]


def local_point(scene: sd.SceneData, prim, world_pt):
    """world_to_object with the build-time-composed inverse (object.rs:102-109)."""
    inv = scene.prim_inv[prim]  # [R,3,4]
    return jnp.einsum("rij,rj->ri", inv[:, :, :3], world_pt) + inv[:, :, 3]


def normal_at(scene: sd.SceneData, prim, u, v, world_pt):
    """World-space unit normal at the hit (pre eye-facing flip)."""
    ptype = scene.prim_type[prim]
    row = scene.prim_row[prim]
    lp = local_point(scene, prim, world_pt)
    x, y, z = lp[:, 0], lp[:, 1], lp[:, 2]
    present = set(int(t) for t in _present_types(scene))

    local_n = jnp.zeros_like(lp)

    def merge(code, n):
        return jnp.where((ptype == code)[:, None], n, local_n)

    if sd.SPHERE in present:
        local_n = merge(sd.SPHERE, lp)
    if sd.PLANE in present:
        n = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], lp.dtype), lp.shape)
        local_n = merge(sd.PLANE, n)
    if sd.CUBE in present:
        ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
        maxc = jnp.maximum(ax, jnp.maximum(ay, az))
        zeros = jnp.zeros_like(x)
        n = jnp.where((maxc == ax)[:, None],
                      jnp.stack([x, zeros, zeros], -1),
                      jnp.where((maxc == ay)[:, None],
                                jnp.stack([zeros, y, zeros], -1),
                                jnp.stack([zeros, zeros, z], -1)))
        local_n = merge(sd.CUBE, n)
    if sd.CYLINDER in present:
        cmin = _gather_rows(scene.cyl_min, row)
        cmax = _gather_rows(scene.cyl_max, row)
        dist = x * x + z * z
        zeros = jnp.zeros_like(x)
        ones = jnp.ones_like(x)
        side = jnp.stack([x, zeros, z], -1)
        top = jnp.stack([zeros, ones, zeros], -1)
        bot = jnp.stack([zeros, -ones, zeros], -1)
        n = jnp.where(((dist < 1.0) & (y >= cmax - EPSILON))[:, None], top,
                      jnp.where(((dist < 1.0) & (y <= cmin + EPSILON))[:, None],
                                bot, side))
        local_n = merge(sd.CYLINDER, n)
    if sd.CONE in present:
        cmin = _gather_rows(scene.con_min, row)
        cmax = _gather_rows(scene.con_max, row)
        dist = x * x + z * z
        zeros = jnp.zeros_like(x)
        ones = jnp.ones_like(x)
        ny = jnp.sqrt(jnp.maximum(dist, 0.0))
        ny = jnp.where(y > 0.0, -ny, ny)
        side = jnp.stack([x, ny, z], -1)
        top = jnp.stack([zeros, ones, zeros], -1)
        bot = jnp.stack([zeros, -ones, zeros], -1)
        n = jnp.where(((dist < 1.0) & (y >= cmax - EPSILON))[:, None], top,
                      jnp.where(((dist < 1.0) & (y <= cmin + EPSILON))[:, None],
                                bot, side))
        local_n = merge(sd.CONE, n)
    if sd.TORUS in present:
        r = _gather_rows(scene.tor_r, row)
        ss = x * x + y * y + z * z
        ps = 1.0 + r * r
        n = jnp.stack([4.0 * x * (ss - ps),
                       4.0 * y * (ss - ps),
                       4.0 * z * (ss - ps + 2.0)], -1)
        local_n = merge(sd.TORUS, n)

    world_n = _normalize(jnp.einsum("rij,rj->ri", scene.prim_nmat[prim], local_n))

    if sd.TRIANGLE in present:
        # One formula for smooth AND flat (flat tris store n1=n2=n3 —
        # the interpolation is the identity), so grad attribution to
        # the normal tables is identical on every execution path.
        n1 = _gather_rows(scene.tri_n1, row)
        n2 = _gather_rows(scene.tri_n2, row)
        n3 = _gather_rows(scene.tri_n3, row)
        interp = (n2 * u[:, None] + n3 * v[:, None]
                  + n1 * (1.0 - u - v)[:, None])
        tri_n = _normalize(interp)
        world_n = jnp.where((ptype == sd.TRIANGLE)[:, None], tri_n, world_n)

    return world_n


def _present_types(scene: sd.SceneData):
    ns, npl, ncu, ncy, nco, nto, T, _ = scene.counts
    out = []
    for code, n in ((sd.SPHERE, ns), (sd.PLANE, npl), (sd.CUBE, ncu),
                    (sd.CYLINDER, ncy), (sd.CONE, nco), (sd.TORUS, nto),
                    (sd.TRIANGLE, T)):
        if n:
            out.append(code)
    return out


def uv_at(scene: sd.SceneData, prim, pts):
    """Per-shape uv_mapping evaluated on pattern-space points [R,3]."""
    ptype = scene.prim_type[prim]
    row = scene.prim_row[prim]
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    pi = jnp.pi
    present = set(int(t) for t in _present_types(scene))
    u = jnp.zeros_like(x)
    v = jnp.zeros_like(x)

    def merge(code, uu, vv):
        m = ptype == code
        return jnp.where(m, uu, u), jnp.where(m, vv, v)

    if sd.SPHERE in present:
        theta = jnp.arctan2(z, x)
        rr = jnp.sqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
        phi = jnp.arccos(jnp.clip(y / rr, -1.0, 1.0))
        u, v = merge(sd.SPHERE, (theta + pi) / (2.0 * pi), 1.0 - phi / pi)
    if sd.PLANE in present:
        uu = jnp.mod(x, 1.0)
        vv = jnp.mod(z, 1.0)
        u, v = merge(sd.PLANE, uu, vv)
    if sd.CUBE in present:
        ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
        # face selection (cube.rs:132-174)
        fx = (ax >= ay) & (ax >= az)
        fy = ~fx & (ay >= ax) & (ay >= az)
        ur = jnp.where(x > 0, (z + 1.0) * 0.5, (1.0 - z) * 0.5)
        vr = (y + 1.0) * 0.5
        uy = (x + 1.0) * 0.5
        vy = jnp.where(y > 0, (1.0 - z) * 0.5, (z + 1.0) * 0.5)
        uz = jnp.where(z > 0, (x + 1.0) * 0.5, (1.0 - x) * 0.5)
        vz = (y + 1.0) * 0.5
        uu = jnp.where(fx, ur, jnp.where(fy, uy, uz))
        vv = jnp.where(fx, vr, jnp.where(fy, vy, vz))
        u, v = merge(sd.CUBE, uu, vv)
    if sd.CYLINDER in present:
        cmin = _gather_rows(scene.cyl_min, row)
        cmax = _gather_rows(scene.cyl_max, row)
        closed = _gather_rows(scene.cyl_closed, row)
        cap = closed & ((y <= cmin) | (y >= cmax))
        theta = jnp.arctan2(z, x)
        uu_side = (theta + pi) / (2.0 * pi)
        vv_side = jnp.mod(y, 1.0)
        uu_cap = (x + 1.0) / 2.0
        vv_cap = (z + 1.0) / 2.0
        u, v = merge(sd.CYLINDER, jnp.where(cap, uu_cap, uu_side),
                     jnp.where(cap, vv_cap, vv_side))
    if sd.CONE in present:
        cmin = _gather_rows(scene.con_min, row)
        cmax = _gather_rows(scene.con_max, row)
        closed = _gather_rows(scene.con_closed, row)
        cap = closed & ((jnp.abs(y - cmin) <= EPSILON)
                        | (jnp.abs(y - cmax) <= EPSILON))
        radius = jnp.maximum(jnp.abs(y), 1e-30)
        uu_cap = (x / radius + 1.0) / 2.0
        vv_cap = (z / radius + 1.0) / 2.0
        theta = (jnp.arctan2(z, x) + pi) / (2.0 * pi)
        height = jnp.where(jnp.abs(cmax - cmin) < 1e-30, 1e-30, cmax - cmin)
        # NOTE (cone.rs:244-253): the reference returns (normalized_y, theta).
        uu_side = (y - cmin) / height
        vv_side = theta
        u, v = merge(sd.CONE, jnp.where(cap, uu_cap, uu_side),
                     jnp.where(cap, vv_cap, vv_side))
    if sd.TORUS in present:
        uu = (jnp.arctan2(y, x) + pi) / (2.0 * pi)
        dist = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-30)) - 1.0
        vv = (jnp.arctan2(z, dist) + pi) / (2.0 * pi)
        u, v = merge(sd.TORUS, uu, vv)
    if sd.TRIANGLE in present:
        # Barycentric uv against object-space vertices (triangle.rs:148-170).
        # Our triangle tables are world-space; uv is evaluated against them,
        # which matches because barycentric coordinates are affine-invariant
        # only when the query point lives in the same space — pattern-space
        # points on textured meshes are assumed untransformed (identity
        # leaf transforms, the OBJ path).
        p1 = _gather_rows(scene.tri_p1, row)
        e1 = _gather_rows(scene.tri_e1, row)
        e2 = _gather_rows(scene.tri_e2, row)
        v2 = pts - p1
        d00 = _dot(e1, e1)
        d01 = _dot(e1, e2)
        d11 = _dot(e2, e2)
        d20 = _dot(v2, e1)
        d21 = _dot(v2, e2)
        denom = d00 * d11 - d01 * d01
        denom = jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        l1 = (d11 * d20 - d01 * d21) / denom
        l2 = (d00 * d21 - d01 * d20) / denom
        u, v = merge(sd.TRIANGLE, l1, l2)
    return u, v
