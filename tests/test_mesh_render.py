"""Mesh rendering end-to-end: teapot-low.obj (240 tris) through the
chunked triangle path with smooth normals, plus the area-light golden
(loose tolerance: the reference samples with a nondeterministic
thread_rng; we use a seeded PRNG)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from rray_tpu import (Camera, Material, Pattern, PointLight, RenderSettings,
                      Shape, compile_camera, compile_scene)
from rray_tpu import mathutils as mu
from rray_tpu.render.integrator import render

TEAPOT = "/root/reference/examples/teapot-low.obj"


@pytest.mark.skipif(not os.path.exists(TEAPOT), reason="no reference fixture")
class TestTeapot:
    def test_render_teapot(self):
        from rray_tpu.io.obj_loader import load_obj_file

        mesh = load_obj_file(TEAPOT, Material(
            pattern=Pattern.solid([0.8, 0.5, 0.3])))
        mesh.transform = mu.compose([mu.rotate_x(-np.pi / 2),
                                     mu.scale(0.12, 0.12, 0.12)])
        floor = Shape("plane", material=Material(
            pattern=Pattern.solid([0.9, 0.9, 0.9]), specular=0.0))
        light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
        scene = compile_scene([floor, mesh], [light], dtype=jnp.float64)
        assert scene.counts[6] == 240
        # Every triangle is smooth (teapot-low.obj carries vn records).
        assert bool(np.asarray(scene.tri_smooth).all())

        cam_h = Camera(64, 48, np.pi / 3)
        cam_h.transform = mu.view_transform([0, 1.5, -4], [0, 0.7, 0],
                                            [0, 1, 0])
        cam = compile_camera(cam_h, jnp.float64)
        settings = RenderSettings(rows_per_tile=16, tri_chunk=64)
        img = np.asarray(render(scene, cam, settings=settings))
        assert np.isfinite(img).all()
        # The teapot (warm color) must occupy a plausible image fraction.
        warm = (img[:, :, 0] > img[:, :, 2] * 1.3) & (img[:, :, 0] > 0.05)
        assert 0.05 < warm.mean() < 0.8, warm.mean()

    def test_pallas_kernel_matches_xla(self):
        """Fused Möller–Trumbore kernel (interpret mode) vs the XLA
        chunked-scan path, end-to-end through the renderer."""
        from rray_tpu.io.obj_loader import load_obj_file

        mesh = load_obj_file(TEAPOT, Material(
            pattern=Pattern.solid([0.8, 0.5, 0.3])))
        mesh.transform = mu.compose([mu.rotate_x(-np.pi / 2),
                                     mu.scale(0.12, 0.12, 0.12)])
        floor = Shape("plane", material=Material(
            pattern=Pattern.solid([0.9, 0.9, 0.9]), specular=0.0))
        light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
        scene = compile_scene([floor, mesh], [light], dtype=jnp.float32)
        cam_h = Camera(48, 32, np.pi / 3)
        cam_h.transform = mu.view_transform([0, 1.5, -4], [0, 0.7, 0],
                                            [0, 1, 0])
        cam = compile_camera(cam_h, jnp.float32)
        a = np.asarray(render(scene, cam,
                              settings=RenderSettings(rows_per_tile=32,
                                                      pallas="off")))
        b = np.asarray(render(scene, cam,
                              settings=RenderSettings(rows_per_tile=32,
                                                      pallas="interpret")))
        np.testing.assert_allclose(a, b, atol=1e-3)

    def test_chunk_size_invariance(self):
        """Chunked scan vs single chunk must agree exactly."""
        from rray_tpu.io.obj_loader import load_obj_file

        mesh = load_obj_file(TEAPOT, Material())
        mesh.transform = mu.scale(0.1, 0.1, 0.1)
        light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
        scene = compile_scene([mesh], [light], dtype=jnp.float64)
        cam_h = Camera(32, 24, np.pi / 3)
        cam_h.transform = mu.view_transform([0, 1, -4], [0, 0, 0], [0, 1, 0])
        cam = compile_camera(cam_h, jnp.float64)
        imgs = []
        for chunk in (37, 240, 512):
            settings = RenderSettings(rows_per_tile=24, tri_chunk=chunk)
            imgs.append(np.asarray(render(scene, cam, settings=settings)))
        np.testing.assert_allclose(imgs[0], imgs[1], atol=1e-12)
        np.testing.assert_allclose(imgs[1], imgs[2], atol=1e-12)


@pytest.mark.skipif(not os.path.exists(TEAPOT), reason="no reference fixture")
def test_transparent_mesh_sorted_soa_matches_aos():
    """Glass teapot: the sorted SoA path with triangle top-K slots must
    match the AoS sorted machinery (refraction containers + smooth
    normals through meshes)."""
    import jax

    from rray_tpu.io.obj_loader import load_obj_file
    from rray_tpu.ops.vec import V3
    from rray_tpu.render import integrator as I
    from rray_tpu.render.camera import all_rays

    mesh = load_obj_file(TEAPOT, Material(
        pattern=Pattern.solid([0.9, 0.9, 1.0]), transparency=0.8,
        refractive_index=1.4, reflective=0.1, diffuse=0.2))
    mesh.transform = mu.compose([mu.rotate_x(-np.pi / 2),
                                 mu.scale(0.12, 0.12, 0.12)])
    floor = Shape("plane", material=Material(
        pattern=Pattern("checker", a=Pattern.solid([1.0, 1.0, 1.0]),
                        b=Pattern.solid([0.2, 0.2, 0.2])), specular=0.0))
    light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
    scene = compile_scene([floor, mesh], [light], dtype=jnp.float64)
    cam_h = Camera(24, 16, np.pi / 3)
    cam_h.transform = mu.view_transform([0, 1.5, -4], [0, 0.7, 0], [0, 1, 0])
    cam = compile_camera(cam_h, jnp.float64)
    # Full wavefront capacity: this is a machinery A/B (SoA vs AoS), so
    # the compact path must not drop any weight-tail paths.
    st = RenderSettings(rows_per_tile=16, max_hits=8, containers_depth=4,
                        depth=3, tri_chunk=64, wavefront_capacity=8)
    ro, rd = all_rays(cam)
    key = jax.random.PRNGKey(0)
    a = np.asarray(I._color_at_sorted(scene, ro, rd, 3, st, key))
    b = np.asarray(I._color_at_sorted_soa(
        scene, V3(ro[:, 0], ro[:, 1], ro[:, 2]),
        V3(rd[:, 0], rd[:, 1], rd[:, 2]), 3, st, key).to_array())
    np.testing.assert_allclose(a, b, atol=1e-9)


AREA = "/root/reference/examples/area_light.yaml"


@pytest.mark.skipif(not os.path.exists(AREA), reason="no reference fixture")
def test_area_light_golden():
    from PIL import Image

    from rray_tpu.api import render_scene_from_file
    from rray_tpu.render.canvas import to_u8

    ref = np.asarray(
        Image.open("/root/reference/examples/area_light.png").convert("RGB"),
        np.float64)
    h, w = ref.shape[:2]
    img = render_scene_from_file(AREA, w, h, "", aa=1, dtype=jnp.float32)
    ours = to_u8(img).astype(np.float64)
    diff = np.abs(ours - ref).max(axis=-1)
    # Soft-shadow sampling differs (seeded PRNG vs thread_rng) and the
    # scene is reflective; allow penumbra-scale deviations.
    assert diff.mean() <= 20.0, diff.mean()
    assert (diff > 60).mean() <= 0.10, (diff > 60).mean()


FULL_TEAPOT = "/root/reference/examples/teapot.obj"


@pytest.mark.skipif(not os.path.exists(FULL_TEAPOT),
                    reason="no reference fixture")
class TestBVH:
    """LBVH traversal kernel (kernels/bvh.py): HBM-streamed leaves vs the
    VMEM-resident linear kernel and the XLA path. Replaces the
    reference's linear group scan (group.rs:80-91)."""

    def test_full_teapot_renders_via_bvh(self):
        """3200-face teapot end-to-end: BVH (interpret) vs XLA chunks."""
        from rray_tpu.io.obj_loader import load_obj_file

        mesh = load_obj_file(FULL_TEAPOT, Material(
            pattern=Pattern.solid([0.8, 0.5, 0.3])))
        mesh.transform = mu.compose([mu.rotate_x(-np.pi / 2),
                                     mu.scale(0.05, 0.05, 0.05)])
        floor = Shape("plane", material=Material(
            pattern=Pattern.solid([0.9, 0.9, 0.9]), specular=0.0))
        light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
        scene = compile_scene([floor, mesh], [light], dtype=jnp.float32)
        assert scene.counts[6] == 6320  # 3200 mixed tri/quad faces fanned
        cam_h = Camera(48, 32, np.pi / 3)
        cam_h.transform = mu.view_transform([0, 1.5, -4], [0, 0.7, 0],
                                            [0, 1, 0])
        cam = compile_camera(cam_h, jnp.float32)
        a = np.asarray(render(scene, cam,
                              settings=RenderSettings(rows_per_tile=32,
                                                      pallas="off")))
        b = np.asarray(render(scene, cam,
                              settings=RenderSettings(rows_per_tile=32,
                                                      pallas="interpret")))
        assert np.isfinite(b).all()
        np.testing.assert_allclose(a, b, atol=1e-3)

    def test_large_synthetic_mesh_kernel(self):
        """~100k-triangle mesh: BVH traversal (leaves DMA'd from HBM)
        must agree with the exhaustive linear kernel, closest AND
        bounded any-hit."""
        import jax

        from rray_tpu.kernels import bvh as kbvh
        from rray_tpu.kernels import triangles as ktri

        rng = np.random.default_rng(7)
        T, R = 100_000, 512
        # clustered triangles (so the BVH actually culls)
        centers = rng.uniform(-20, 20, (3, T)).astype(np.float32)
        p1 = centers + rng.uniform(-0.2, 0.2, (3, T)).astype(np.float32)
        e1 = rng.uniform(-0.4, 0.4, (3, T)).astype(np.float32)
        e2 = rng.uniform(-0.4, 0.4, (3, T)).astype(np.float32)
        tri = tuple(jnp.asarray(c) for c in (*p1, *e1, *e2))
        ro = tuple(jnp.asarray(
            rng.uniform(-1, 1, R).astype(np.float32)) for _ in range(3))
        d = rng.uniform(-1, 1, (3, R)).astype(np.float32)
        d /= np.linalg.norm(d, axis=0, keepdims=True)
        rd = tuple(jnp.asarray(c) for c in d)

        bt, bu, bv, bi = kbvh.bvh_closest_triangle(ro, rd, tri,
                                                   interpret=True)
        padT = (-T) % ktri.chunk_size(T)
        trip = tuple(jnp.pad(c, (0, padT),
                             constant_values=(ktri._FAR if k < 3 else 0.0))
                     for k, c in enumerate(tri))
        lt, lu, lv, li = ktri.closest_triangle(ro, rd, trip, interpret=True)
        bt, lt = np.asarray(bt), np.asarray(lt)
        hit = np.isfinite(lt)
        assert hit.any()
        assert (np.isfinite(bt) == hit).all()
        np.testing.assert_allclose(bt[hit], lt[hit], rtol=2e-4, atol=1e-5)
        assert (np.asarray(bi)[hit] == np.asarray(li)[hit]).all()

        dist = jnp.full((R,), 25.0, jnp.float32)
        at, _, _, _ = kbvh.bvh_closest_triangle(ro, rd, tri, dist=dist,
                                                any_hit=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(at) < 25.0,
                                      np.where(hit, lt, np.inf) < 25.0)

    def test_bvh_seeded_closest_merges_exactly(self):
        """BVH analogue of the linear-kernel seed test: with dist=seed
        (the production closest-hit-with-seed path, soa.py
        `_pallas_triangle_best`), subtrees behind the seed may be
        culled, so hits behind it can be dropped — but merging kernel
        output against the seed by strict `<` must equal the unseeded
        merge, with identical winning payloads."""
        from rray_tpu.kernels import bvh as kbvh

        rng = np.random.default_rng(11)
        T, R = 1536, 512  # >= bvh_min_tris (1024), not a leaf multiple
        centers = rng.uniform(-12, 12, (3, T)).astype(np.float32)
        p1 = centers + rng.uniform(-0.3, 0.3, (3, T)).astype(np.float32)
        e1 = rng.uniform(-0.6, 0.6, (3, T)).astype(np.float32)
        e2 = rng.uniform(-0.6, 0.6, (3, T)).astype(np.float32)
        tri = tuple(jnp.asarray(c) for c in (*p1, *e1, *e2))
        ro = tuple(jnp.asarray(
            rng.uniform(-1, 1, R).astype(np.float32)) for _ in range(3))
        d = rng.uniform(-1, 1, (3, R)).astype(np.float32)
        d /= np.linalg.norm(d, axis=0, keepdims=True)
        rd = tuple(jnp.asarray(c) for c in d)

        t0, u0, v0, i0 = (np.asarray(o) for o in kbvh.bvh_closest_triangle(
            ro, rd, tri, interpret=True))
        seed = rng.uniform(1.0, 30.0, R).astype(np.float32)
        ts, us, vs, isx = (np.asarray(o) for o in kbvh.bvh_closest_triangle(
            ro, rd, tri, dist=jnp.asarray(seed), interpret=True))
        tri_wins = t0 < seed
        np.testing.assert_allclose(np.where(ts < seed, ts, seed),
                                   np.where(tri_wins, t0, seed), rtol=1e-6)
        win = ts < seed
        assert (isx[win] == i0[win]).all()
        np.testing.assert_allclose(us[win], u0[win], rtol=1e-6)
        np.testing.assert_allclose(vs[win], v0[win], rtol=1e-6)


class TestBVHLeafScaling:
    """Meshes past the SMEM node-box budget auto-raise the leaf size
    instead of asserting (the reference's linear scan has no size cliff
    — load_obj.rs:124-139)."""

    def test_auto_leaf_math(self):
        from rray_tpu.kernels import bvh as kbvh

        # Below the budget: leaf unchanged.
        assert kbvh.auto_leaf(240) == kbvh.LEAF
        assert kbvh.auto_leaf(kbvh.MAX_LEAVES * kbvh.LEAF) == kbvh.LEAF
        # 600k triangles used to trip the 2048-leaf assert; now the leaf
        # grows to ceil(600000/2048)=293 -> 296 (sublane-aligned).
        leaf = kbvh.auto_leaf(600_000)
        assert leaf == 296
        Lp, _ = kbvh.tree_sizes(600_000, leaf)
        assert Lp <= kbvh.MAX_LEAVES
        # Monotone + always sufficient across a size sweep.
        for T in (1, 1000, 524_289, 2_000_000, 10_000_000):
            lf = kbvh.auto_leaf(T)
            assert lf % 8 == 0
            Lp, _ = kbvh.tree_sizes(T, lf)
            assert Lp <= kbvh.MAX_LEAVES

    def test_auto_raised_leaf_traversal_matches(self):
        """Force the auto-raise path with a tiny max_leaves budget: the
        reshaped tree (2 fat leaves instead of 8) must reproduce the
        default traversal exactly — same winners, same payloads."""
        from rray_tpu.kernels import bvh as kbvh

        rng = np.random.default_rng(13)
        T, R = 1536, 512
        centers = rng.uniform(-12, 12, (3, T)).astype(np.float32)
        p1 = centers + rng.uniform(-0.3, 0.3, (3, T)).astype(np.float32)
        e1 = rng.uniform(-0.6, 0.6, (3, T)).astype(np.float32)
        e2 = rng.uniform(-0.6, 0.6, (3, T)).astype(np.float32)
        tri = tuple(jnp.asarray(c) for c in (*p1, *e1, *e2))
        ro = tuple(jnp.asarray(
            rng.uniform(-1, 1, R).astype(np.float32)) for _ in range(3))
        d = rng.uniform(-1, 1, (3, R)).astype(np.float32)
        d /= np.linalg.norm(d, axis=0, keepdims=True)
        rd = tuple(jnp.asarray(c) for c in d)

        base = [np.asarray(o) for o in kbvh.bvh_closest_triangle(
            ro, rd, tri, interpret=True)]
        raised = [np.asarray(o) for o in kbvh.bvh_closest_triangle(
            ro, rd, tri, interpret=True, max_leaves=2)]
        hit = np.isfinite(base[0])
        assert hit.any()
        assert (np.isfinite(raised[0]) == hit).all()
        for a, b in zip(base, raised):
            np.testing.assert_allclose(a[hit], b[hit], rtol=1e-6, atol=0)

    @pytest.mark.slow
    def test_600k_mesh_renders(self):
        """>=600k-triangle procedural mesh traverses the auto-raised tree
        (interpret mode) and agrees with the exhaustive linear kernel."""
        from rray_tpu.kernels import bvh as kbvh
        from rray_tpu.kernels import triangles as ktri

        rng = np.random.default_rng(17)
        T, R = 600_000, 512
        centers = rng.uniform(-30, 30, (3, T)).astype(np.float32)
        p1 = centers + rng.uniform(-0.2, 0.2, (3, T)).astype(np.float32)
        e1 = rng.uniform(-0.4, 0.4, (3, T)).astype(np.float32)
        e2 = rng.uniform(-0.4, 0.4, (3, T)).astype(np.float32)
        tri = tuple(jnp.asarray(c) for c in (*p1, *e1, *e2))
        ro = tuple(jnp.asarray(
            rng.uniform(-1, 1, R).astype(np.float32)) for _ in range(3))
        d = rng.uniform(-1, 1, (3, R)).astype(np.float32)
        d /= np.linalg.norm(d, axis=0, keepdims=True)
        rd = tuple(jnp.asarray(c) for c in d)

        bt, bu, bv, bi = kbvh.bvh_closest_triangle(ro, rd, tri,
                                                   interpret=True)
        padT = (-T) % ktri.chunk_size(T)
        trip = tuple(jnp.pad(c, (0, padT),
                             constant_values=(ktri._FAR if k < 3 else 0.0))
                     for k, c in enumerate(tri))
        lt, lu, lv, li = ktri.closest_triangle(ro, rd, trip, interpret=True)
        bt, lt = np.asarray(bt), np.asarray(lt)
        hit = np.isfinite(lt)
        assert hit.any()
        assert (np.isfinite(bt) == hit).all()
        np.testing.assert_allclose(bt[hit], lt[hit], rtol=2e-4, atol=1e-5)
        assert (np.asarray(bi)[hit] == np.asarray(li)[hit]).all()


class TestLinearKernelVariants:
    """Shadow any-hit and seed-culled closest-hit forms of the linear
    chunk kernel (kernels/triangles.py) vs the plain closest kernel."""

    def _fixtures(self):
        rng = np.random.default_rng(3)
        R, T = 512, 256
        ro = tuple(jnp.asarray(
            rng.uniform(-2, 2, R).astype(np.float32)) for _ in range(3))
        d = rng.uniform(-1, 1, (3, R)).astype(np.float32)
        d /= np.linalg.norm(d, axis=0, keepdims=True)
        rd = tuple(jnp.asarray(c) for c in d)
        tri = tuple(jnp.asarray(rng.uniform(-3, 3, T).astype(np.float32))
                    for _ in range(9))
        return ro, rd, tri

    def test_any_hit_matches_closest_threshold(self):
        """occluded == (closest t < dist), the reference's shadow rule
        hit.t < distance (scene.rs:234-245)."""
        from rray_tpu.kernels import triangles as ktri

        ro, rd, tri = self._fixtures()
        t0 = np.asarray(ktri.closest_triangle(ro, rd, tri,
                                              interpret=True)[0])
        rng = np.random.default_rng(4)
        dist = jnp.asarray(
            rng.uniform(0.0, 8.0, ro[0].shape[0]).astype(np.float32))
        hit = np.asarray(ktri.any_triangle(ro, rd, tri, dist,
                                           interpret=True))
        np.testing.assert_array_equal(hit != 0, t0 < np.asarray(dist))

    def test_seeded_closest_merges_exactly(self):
        """With a t_init seed, merging kernel output against the seed by
        strict `<` must equal the unseeded merge (chunk culling may
        drop hits behind the seed, never in front of it)."""
        from rray_tpu.kernels import triangles as ktri

        ro, rd, tri = self._fixtures()
        t0, u0, v0, i0 = (np.asarray(o) for o in ktri.closest_triangle(
            ro, rd, tri, interpret=True))
        rng = np.random.default_rng(5)
        seed = rng.uniform(0.5, 6.0, ro[0].shape[0]).astype(np.float32)
        ts, us, vs, isx = (np.asarray(o) for o in ktri.closest_triangle(
            ro, rd, tri, t_init=jnp.asarray(seed), interpret=True))
        tri_wins = t0 < seed
        merged_t = np.where(ts < seed, ts, seed)
        np.testing.assert_allclose(
            merged_t, np.where(tri_wins, t0, seed), rtol=1e-6)
        assert (isx[ts < seed] == i0[ts < seed]).all()
        np.testing.assert_allclose(us[ts < seed], u0[ts < seed], rtol=1e-6)
        np.testing.assert_allclose(vs[ts < seed], v0[ts < seed], rtol=1e-6)
