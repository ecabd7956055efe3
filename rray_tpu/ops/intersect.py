"""Batched, masked ray/primitive intersection kernels.

Each reference `local_intersect` (sphere.rs:64-78, plane.rs:51-58,
cube.rs:65-77, cylinder.rs:94-123, cone.rs:120-166, torus.rs:36-93,
triangle.rs:72-94) becomes a closed-form vectorized evaluation over
[R rays, N primitives] returning fixed hit slots (t, valid). Branches are
masks; divisions are guarded so invalid lanes stay NaN-free (and
differentiable).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import EPSILON
from . import quartic

_BIG = 1e30


def _safe_div(a, b, eps=1e-30):
    denom = jnp.where(jnp.abs(b) < eps, jnp.where(b < 0, -eps, eps), b)
    return a / denom


def transform_rays(inv, ro, rd):
    """Apply world->object affines [N,3,4] to rays [R,3] -> [R,N,3] pair."""
    lin = inv[:, :, :3]            # [N,3,3]
    trans = inv[:, :, 3]           # [N,3]
    ro_l = jnp.einsum("nij,rj->rni", lin, ro) + trans[None, :, :]
    rd_l = jnp.einsum("nij,rj->rni", lin, rd)
    return ro_l, rd_l


def spheres(ro, rd):
    """Unit sphere at origin (sphere.rs:64-78). 2 slots."""
    a = jnp.sum(rd * rd, -1)
    b = 2.0 * jnp.sum(rd * ro, -1)
    c = jnp.sum(ro * ro, -1) - 1.0
    disc = b * b - 4.0 * a * c
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv2a = _safe_div(jnp.asarray(1.0, a.dtype), 2.0 * a)
    t1 = (-b - sq) * inv2a
    t2 = (-b + sq) * inv2a
    t = jnp.stack([t1, t2], -1)
    valid = jnp.stack([ok, ok], -1)
    return t, valid


def planes(ro, rd):
    """xz-plane (plane.rs:51-58). 1 slot."""
    dy = rd[..., 1]
    ok = jnp.abs(dy) >= EPSILON
    t = _safe_div(-ro[..., 1], dy)
    return t[..., None], ok[..., None]


def _slab(o, d, lo=-1.0, hi=1.0):
    """Cube slab axis test matching the reference's infinity/NaN semantics
    (cube.rs:48-61): parallel rays inside the slab span (-inf, inf)."""
    num_min = lo - o
    num_max = hi - o
    parallel = jnp.abs(d) < EPSILON
    t1 = _safe_div(num_min, d)
    t2 = _safe_div(num_max, d)
    tmin = jnp.minimum(t1, t2)
    tmax = jnp.maximum(t1, t2)
    inside = (num_min <= 0.0) & (num_max >= 0.0)
    big = jnp.asarray(_BIG, o.dtype)
    tmin = jnp.where(parallel, jnp.where(inside, -big, big), tmin)
    tmax = jnp.where(parallel, jnp.where(inside, big, -big), tmax)
    return tmin, tmax


def cubes(ro, rd):
    """Unit cube (cube.rs:65-77). 2 slots."""
    xmin, xmax = _slab(ro[..., 0], rd[..., 0])
    ymin, ymax = _slab(ro[..., 1], rd[..., 1])
    zmin, zmax = _slab(ro[..., 2], rd[..., 2])
    tmin = jnp.maximum(xmin, jnp.maximum(ymin, zmin))
    tmax = jnp.minimum(xmax, jnp.minimum(ymax, zmax))
    ok = tmin <= tmax
    t = jnp.stack([tmin, tmax], -1)
    valid = jnp.stack([ok, ok], -1)
    return t, valid


def _caps(ro, rd, ymin, ymax, closed, cap_radius_fn):
    """Shared cap test (cylinder.rs:60-90 / cone.rs:60-96). 2 slots."""
    dy = rd[..., 1]
    cap_possible = closed & (jnp.abs(dy) >= EPSILON)
    t_lo = _safe_div(ymin - ro[..., 1], dy)
    t_hi = _safe_div(ymax - ro[..., 1], dy)

    def at(t):
        x = ro[..., 0] + t * rd[..., 0]
        z = ro[..., 2] + t * rd[..., 2]
        y = ro[..., 1] + t * rd[..., 1]
        return x * x + z * z <= cap_radius_fn(y)

    ok_lo = cap_possible & at(t_lo)
    ok_hi = cap_possible & at(t_hi)
    return jnp.stack([t_lo, t_hi], -1), jnp.stack([ok_lo, ok_hi], -1)


def cylinders(ro, rd, ymin, ymax, closed):
    """Truncated cylinder (cylinder.rs:94-123). 4 slots: body t0/t1 + caps."""
    ox, oy, oz = ro[..., 0], ro[..., 1], ro[..., 2]
    dx, dy, dz = rd[..., 0], rd[..., 1], rd[..., 2]
    a = dx * dx + dz * dz
    body_possible = jnp.abs(a) > EPSILON
    b = 2.0 * (ox * dx + oz * dz)
    c = ox * ox + oz * oz - 1.0
    disc = b * b - 4.0 * a * c
    ok = body_possible & (disc >= 0.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv2a = _safe_div(jnp.asarray(1.0, a.dtype), 2.0 * a)
    t0 = (-b - sq) * inv2a
    t1 = (-b + sq) * inv2a
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    y0 = oy + lo * dy
    y1 = oy + hi * dy
    ok0 = ok & (ymin < y0) & (y0 < ymax)
    ok1 = ok & (ymin < y1) & (y1 < ymax)
    # Reference quirk (cylinder.rs:101-102): a negative discriminant
    # returns [] outright, dropping caps too.
    miss_all = body_possible & (disc < 0.0)
    tc, vc = _caps(ro, rd, ymin, ymax, closed, lambda y: jnp.ones_like(y))
    vc = vc & ~miss_all[..., None]
    t = jnp.concatenate([jnp.stack([lo, hi], -1), tc], -1)
    valid = jnp.concatenate([jnp.stack([ok0, ok1], -1), vc], -1)
    return t, valid


def cones(ro, rd, ymin, ymax, closed):
    """Double-napped truncated cone (cone.rs:120-166). 5 slots:
    linear t + body t0/t1 + caps, reproducing the reference's early-return
    quirks: a linear hit inside the y-range returns *without* caps."""
    ox, oy, oz = ro[..., 0], ro[..., 1], ro[..., 2]
    dx, dy, dz = rd[..., 0], rd[..., 1], rd[..., 2]
    a = dx * dx - dy * dy + dz * dz
    b = 2.0 * (ox * dx - oy * dy + oz * dz)
    c = ox * ox - oy * oy + oz * oz
    a_small = jnp.abs(a) < EPSILON
    b_small = jnp.abs(b) < EPSILON

    # Linear branch (cone.rs:134-141).
    t_lin = _safe_div(-c, 2.0 * b)
    y_lin = oy + t_lin * dy
    lin_hit = a_small & ~b_small & (ymin < y_lin) & (y_lin < ymax)

    # Quadratic branch (also reached with tiny `a` when the linear hit is
    # out of range; the huge resulting t values get y-filtered).
    disc = b * b - 4.0 * a * c
    quad_path = ~(a_small & b_small) & ~lin_hit
    okq = quad_path & (disc >= 0.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv2a = _safe_div(jnp.asarray(1.0, a.dtype), 2.0 * a)
    t0 = (-b - sq) * inv2a
    t1 = (-b + sq) * inv2a
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    y0 = oy + lo * dy
    y1 = oy + hi * dy
    ok0 = okq & (ymin < y0) & (y0 < ymax)
    ok1 = okq & (ymin < y1) & (y1 < ymax)
    # disc < 0 on the quadratic path returns [] before caps (cone.rs:143-146).
    miss_all = quad_path & (disc < 0.0)

    tc, vc = _caps(ro, rd, ymin, ymax, closed, lambda y: y * y)
    vc = vc & ~lin_hit[..., None] & ~miss_all[..., None]

    t = jnp.concatenate([t_lin[..., None], jnp.stack([lo, hi], -1), tc], -1)
    valid = jnp.concatenate([lin_hit[..., None], jnp.stack([ok0, ok1], -1), vc], -1)
    return t, valid


def tori(ro, rd, minor_r):
    """Torus, major radius 1, facing the z axis (torus.rs:36-93). 4 slots.
    Only t > 0 roots are kept, matching the reference's asymmetry."""
    ox, oy, oz = ro[..., 0], ro[..., 1], ro[..., 2]
    dx, dy, dz = rd[..., 0], rd[..., 1], rd[..., 2]
    r_sq = minor_r * minor_r
    sum_d_sq = dx * dx + dy * dy + dz * dz
    e = ox * ox + oy * oy + oz * oz - r_sq + 1.0
    f = ox * dx + oy * dy + oz * dz
    four = 4.0
    a4 = sum_d_sq * sum_d_sq
    a3 = 4.0 * sum_d_sq * f
    a2 = 2.0 * sum_d_sq * e + 4.0 * f * f - four * (dx * dx + dy * dy)
    a1 = 4.0 * e * f - 2.0 * four * (ox * dx + oy * dy)
    a0 = e * e - four * (ox * ox + oy * oy)
    roots, ok = quartic.solve_quartic(a4, a3, a2, a1, a0)
    valid = ok & (roots > 0.0)
    return roots, valid


def triangles(ro, rd, p1, e1, e2):
    """Möller–Trumbore (triangle.rs:72-94). Rays are WORLD-space [R,3];
    triangles [T,3]. Returns t/u/v/valid shaped [R,T]."""
    d = rd[:, None, :]                        # [R,1,3]
    dce2 = jnp.cross(d, e2[None, :, :])       # [R,T,3]
    det = jnp.sum(e1[None, :, :] * dce2, -1)  # [R,T]
    ok = jnp.abs(det) >= EPSILON
    fct = _safe_div(jnp.asarray(1.0, det.dtype), det)
    p1o = ro[:, None, :] - p1[None, :, :]     # [R,T,3]
    u = fct * jnp.sum(p1o * dce2, -1)
    ok = ok & (u >= 0.0) & (u <= 1.0)
    oce1 = jnp.cross(p1o, e1[None, :, :])
    v = fct * jnp.sum(d * oce1, -1)
    ok = ok & (v >= 0.0) & (u + v <= 1.0)
    t = fct * jnp.sum(e2[None, :, :] * oce1, -1)
    return t, u, v, ok
