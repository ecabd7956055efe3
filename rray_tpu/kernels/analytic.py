"""Pallas TPU kernel: the entire area-light soft-shadow loop, fused.

An area light shades each hit point with level^2 jittered shadow
samples (scene.rs:181-214). In XLA that loop runs as a lax.scan whose
per-step chain (~60 flops/ray: sample position, segment, per-prim
occlusion predicates) splits across fusions with HBM round trips — the
BASELINE area scene measured ~0.3 ms per 1.8M-ray step where one fused
chain of the same op count runs in 0.054 ms. Kernel-per-occlusion-test
is the wrong granularity too (tried: input materialization + dispatch
per call made the sphere frame 8x WORSE). The win is fusing the WHOLE
loop: one kernel call per tile, rays in lanes, the n = level^2 samples
and the static prim list unrolled in-register, per-prim parameters as
SMEM scalars, jittered offsets streamed as a [2n, BR] block.

Samples use the same normalized directions, jax.random draws, and 0/1
integer sums as the XLA path, so the fraction is bit-identical (pinned
by an interpret-mode fuzz test and an on-device parity probe).

Supported prim kinds: sphere, plane, cube, cylinder, cone — the
cube/cylinder/cone predicates reuse ops/soa.py's slot formulas verbatim
(pure jnp, traced into the kernel) so local_intersect quirks
(cylinder.rs:101-102 disc<0-drops-caps, cone.rs:134-141 linear case)
cannot drift. Torus slots wrap their quartic in a lax.cond that Mosaic
would flatten (see kernels/triangles.py), and meshes/CSG need the
triangle kernels / member filtering — the caller falls back to the XLA
loop for such scenes.

The fraction is a sum of indicator functions — zero gradient almost
everywhere, exactly like the comparison-based XLA path — so the caller
stops gradients at the kernel boundary.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.vec import V3
from ..scene import data as sd

BR = 512
N_PARAMS = 16  # 12 affine + up to 3 extras, padded

OCCLUSION_KINDS = (sd.SPHERE, sd.PLANE, sd.CUBE, sd.CYLINDER, sd.CONE)


def _occludes(kind, p, ox, oy, oz, dx, dy, dz, dist):
    """Does prim (kind, SMEM param reader p) block [0, dist) on the ray?

    Rays are WORLD-space [BR] lane vectors; p(0..11) is the world→object
    affine, p(12..14) the ymin/ymax/closed extras."""
    o = V3(p(0) * ox + p(1) * oy + p(2) * oz + p(3),
           p(4) * ox + p(5) * oy + p(6) * oz + p(7),
           p(8) * ox + p(9) * oy + p(10) * oz + p(11))
    d = V3(p(0) * dx + p(1) * dy + p(2) * dz,
           p(4) * dx + p(5) * dy + p(6) * dz,
           p(8) * dx + p(9) * dy + p(10) * dz)
    from ..ops import soa  # slot formulas (import here: soa imports us)
    if kind == sd.SPHERE:
        return soa._sphere_occludes_local(o, d, dist)
    if kind == sd.PLANE:
        return soa._plane_occludes_local(o, d, dist)
    if kind == sd.CUBE:
        slots = soa._cube_slots(o, d)
    elif kind == sd.CYLINDER:
        slots = soa._cylinder_slots(o, d, p(12), p(13), p(14) != 0.0)
    elif kind == sd.CONE:
        slots = soa._cone_slots(o, d, p(12), p(13), p(14) != 0.0)
    else:  # pragma: no cover — caller filters kinds
        raise AssertionError(f"unsupported kind {kind}")
    hit = jnp.zeros_like(dist, bool)
    for t, valid in slots:
        hit = hit | (valid & (t >= 0.0) & (t < dist))
    return hit


def _kernel(kinds, level, rox, roy, roz, rand_ref, light_ref, params,
            frac_ref):
    n = level * level
    ox, oy, oz = rox[0, :], roy[0, :], roz[0, :]
    L = lambda j: light_ref[j]
    acc = jnp.zeros_like(ox)
    for s in range(n):
        col = float(s % level)
        row = float(s // level)
        ur = (col + rand_ref[s, :]) / level
        vr = (row + rand_ref[n + s, :]) / level
        # Normalized direction like the reference (and the XLA loop):
        # an unnormalized segment would rescale the EPSILON guards in
        # the cube/cylinder/cone slot forms by |seg|^2. The per-sample
        # sqrt/rsqrt is register-resident here — noise in kernel time.
        sx = L(0) + L(3) * ur + L(6) * vr - ox
        sy = L(1) + L(4) * ur + L(7) * vr - oy
        sz = L(2) + L(5) * ur + L(8) * vr - oz
        dist = jnp.sqrt(sx * sx + sy * sy + sz * sz)
        inv = 1.0 / jnp.maximum(dist, 1e-30)
        dxs, dys, dzs = sx * inv, sy * inv, sz * inv
        occ = jnp.zeros_like(ox, bool)
        for i, kind in enumerate(kinds):
            occ = occ | _occludes(kind, lambda j, i=i: params[i, j],
                                  ox, oy, oz, dxs, dys, dzs, dist)
        acc = acc + occ.astype(ox.dtype)
    # Raw count, not count/n: Mosaic lowers division to a reciprocal
    # multiply (20/25 -> 0.79999995); the caller divides in XLA so the
    # fraction is bit-identical to the XLA loop.
    frac_ref[0, :] = acc


@functools.partial(jax.jit, static_argnames=("kinds", "level", "interpret"))
def area_shadow_fraction(over_comps, rand, light_params, prim_params, kinds,
                         level: int, interpret: bool = False):
    """Shadowed fraction over level^2 jittered samples -> [R] f32.

    over_comps: 3-tuple of [R] f32 hit points; rand: [2, n, R] uniform
    draws (same consumption order as the XLA loop: sample s reads
    rand[0, s] and rand[1, s]); light_params: [9] f32 (corner, uvec,
    vvec); prim_params: [len(kinds), 16] f32 (12 world→object affine
    coefficients + ymin/ymax/closed for cylinders/cones); kinds: static
    prim type codes (subset of OCCLUSION_KINDS)."""
    R = over_comps[0].shape[0]
    n = level * level
    padR = (-R) % BR
    f32 = jnp.float32

    def padr(c):
        c = c.astype(f32)
        return jnp.pad(c, [(0, 0)] * (c.ndim - 1) + [(0, padR)]) if padR \
            else c

    Rp = R + padR
    args = [padr(c).reshape(1, Rp) for c in over_comps]
    args.append(padr(rand.reshape(2 * n, R)))
    args.append(light_params.astype(f32))
    args.append(prim_params.astype(f32))

    ray_spec = pl.BlockSpec((1, BR), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    rand_spec = pl.BlockSpec((2 * n, BR), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, tuple(kinds), level),
        grid=(Rp // BR,),
        in_specs=[ray_spec] * 3 + [rand_spec, smem, smem],
        out_specs=pl.BlockSpec((1, BR), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Rp), f32),
        interpret=interpret,
    )(*args)
    return out.reshape(Rp)[:R] / n
