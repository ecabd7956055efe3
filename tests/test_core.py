"""Book-scenario oracle tests (SURVEY.md §4): the reference's inline unit
tests hard-code expected values from "The Ray Tracer Challenge"; those are
renderer-independent math facts, so the TPU build must reproduce them."""
import jax.numpy as jnp
import numpy as np
import pytest

from rray_tpu import (Camera, Material, Pattern, PointLight, RenderSettings,
                      Shape, color_at, compile_camera, compile_scene)
from rray_tpu import mathutils as mu
from rray_tpu.ops import hits as hits_mod
from rray_tpu.render.camera import rays_for_pixels
import jax


def default_scene():
    """Scene::default_scene (scene.rs:79-92)."""
    s1 = Shape("sphere", material=Material(
        pattern=Pattern.solid([0.8, 1.0, 0.6]), diffuse=0.7, specular=0.2))
    s2 = Shape("sphere", transform=mu.scale(0.5, 0.5, 0.5), material=Material())
    light = PointLight(np.array([-10.0, 10.0, -10.0]), np.array([1.0, 1.0, 1.0]))
    return compile_scene([s1, s2], [light], dtype=jnp.float64)


SET = RenderSettings()


def trace(scene, origin, direction, remaining=5):
    ro = jnp.asarray([origin], jnp.float64)
    rd = jnp.asarray([direction], jnp.float64)
    return np.asarray(color_at(scene, ro, rd, remaining, SET,
                               jax.random.PRNGKey(0))[0])


def sorted_ts(scene, origin, direction):
    ro = jnp.asarray([origin], jnp.float64)
    rd = jnp.asarray([direction], jnp.float64)
    slots = hits_mod.gather_sorted_hits(scene, ro, rd, SET)
    t = np.asarray(slots.t[0])
    return t[np.isfinite(t)]


class TestIntersections:
    def test_world_intersections(self):
        # scene.rs:402-411
        scene = default_scene()
        ts = sorted_ts(scene, [0, 0, -5], [0, 0, 1])
        np.testing.assert_allclose(ts, [4.0, 4.5, 5.5, 6.0], atol=1e-9)

    def test_sphere_tangent_and_miss(self):
        # object.rs:296-331
        s = Shape("sphere", material=Material())
        light = PointLight(np.zeros(3), np.ones(3))
        scene = compile_scene([s], [light], dtype=jnp.float64)
        np.testing.assert_allclose(sorted_ts(scene, [0, 1, -5], [0, 0, 1]),
                                   [5.0, 5.0], atol=1e-9)
        assert sorted_ts(scene, [0, 2, -5], [0, 0, 1]).size == 0
        np.testing.assert_allclose(sorted_ts(scene, [0, 0, 0], [0, 0, 1]),
                                   [-1.0, 1.0], atol=1e-9)
        np.testing.assert_allclose(sorted_ts(scene, [0, 0, 5], [0, 0, 1]),
                                   [-6.0, -4.0], atol=1e-9)

    def test_scaled_translated_sphere(self):
        light = PointLight(np.zeros(3), np.ones(3))
        s = Shape("sphere", transform=mu.scale(2, 2, 2), material=Material())
        scene = compile_scene([s], [light], dtype=jnp.float64)
        np.testing.assert_allclose(sorted_ts(scene, [0, 0, -5], [0, 0, 1]),
                                   [3.0, 7.0], atol=1e-9)
        s = Shape("sphere", transform=mu.translate(5, 0, 0), material=Material())
        scene = compile_scene([s], [light], dtype=jnp.float64)
        assert sorted_ts(scene, [0, 0, -5], [0, 0, 1]).size == 0


class TestShading:
    def test_shading_an_intersection(self):
        # scene.rs:413-422
        scene = default_scene()
        c = trace(scene, [0, 0, -5], [0, 0, 1])
        np.testing.assert_allclose(c, [0.38066, 0.47583, 0.2855], atol=1e-5)

    def test_shading_inside(self):
        # scene.rs:424-435
        s1 = Shape("sphere", material=Material(
            pattern=Pattern.solid([0.8, 1.0, 0.6]), diffuse=0.7, specular=0.2))
        s2 = Shape("sphere", transform=mu.scale(0.5, 0.5, 0.5), material=Material())
        light = PointLight(np.array([0.0, 0.25, 0.0]), np.ones(3))
        scene = compile_scene([s1, s2], [light], dtype=jnp.float64)
        c = trace(scene, [0, 0, 0], [0, 0, 1])
        np.testing.assert_allclose(c, [0.9049844720832575] * 3, atol=2e-5)

    def test_color_when_ray_misses(self):
        scene = default_scene()
        np.testing.assert_allclose(trace(scene, [0, 0, -5], [0, 1, 0]),
                                   [0.0, 0.0, 0.0])

    def test_color_behind_ray(self):
        # scene.rs:470-496: ambient=1 inner sphere seen from inside outer
        s1 = Shape("sphere", material=Material(
            pattern=Pattern.solid([0.8, 1.0, 0.6]), diffuse=0.7, specular=0.2,
            ambient=1.0))
        s2 = Shape("sphere", transform=mu.scale(0.5, 0.5, 0.5),
                   material=Material(ambient=1.0))
        light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
        scene = compile_scene([s1, s2], [light], dtype=jnp.float64)
        c = trace(scene, [0, 0, 0.75], [0, 0, -1])
        np.testing.assert_allclose(c, [1.0, 1.0, 1.0], atol=2e-5)

    def test_shadowed_intersection(self):
        # scene.rs:437-452
        s1 = Shape("sphere", material=Material())
        s2 = Shape("sphere", transform=mu.translate(0, 0, 10), material=Material())
        light = PointLight(np.array([0.0, 0.0, -10.0]), np.ones(3))
        scene = compile_scene([s1, s2], [light], dtype=jnp.float64)
        c = trace(scene, [0, 0, 5], [0, 0, 1])
        np.testing.assert_allclose(c, [0.1, 0.1, 0.1], atol=2e-5)


class TestReflection:
    def scene_with_floor(self):
        s1 = Shape("sphere", material=Material(
            pattern=Pattern.solid([0.8, 1.0, 0.6]), diffuse=0.7, specular=0.2))
        s2 = Shape("sphere", transform=mu.scale(0.5, 0.5, 0.5),
                   material=Material(ambient=1.0))
        s3 = Shape("plane", transform=mu.translate(0, -1, 0),
                   material=Material(reflective=0.5))
        light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
        return compile_scene([s1, s2, s3], [light], dtype=jnp.float64)

    def test_shade_hit_reflective(self):
        # scene.rs:581-608
        scene = self.scene_with_floor()
        r2 = np.sqrt(2.0)
        c = trace(scene, [0, 0, -3], [0, -r2 / 2, r2 / 2])
        np.testing.assert_allclose(
            c, [0.8767572837020907, 0.924340334075874, 0.8291742333283075],
            atol=2e-5)

    def test_mutually_reflective_terminates(self):
        # scene.rs:610-629: unclamped 11.4 proves depth-limit semantics
        lower = Shape("plane", transform=mu.translate(0, -1, 0),
                      material=Material(reflective=1.0))
        upper = Shape("plane", transform=mu.translate(0, 1, 0),
                      material=Material(reflective=1.0))
        light = PointLight(np.zeros(3), np.ones(3))
        scene = compile_scene([lower, upper], [light], dtype=jnp.float64)
        c = trace(scene, [0, 0, 0], [0, 1, 0])
        np.testing.assert_allclose(c, [11.4, 11.4, 11.4], atol=2e-4)


class TestRefraction:
    def glass_floor_scene(self, reflective=0.0):
        # s1 carries Pattern::test() (color = point coords, scene.rs:766,804)
        s1 = Shape("sphere", material=Material(
            pattern=Pattern("test"), diffuse=0.7, specular=0.2))
        s2 = Shape("sphere", transform=mu.scale(0.5, 0.5, 0.5), material=Material())
        floor = Shape("plane", transform=mu.translate(0, -1, 0),
                      material=Material(transparency=0.5, refractive_index=1.5,
                                        reflective=reflective))
        ball = Shape("sphere", transform=mu.translate(0, -3.5, -0.5),
                     material=Material(pattern=Pattern.solid([1.0, 0.0, 0.0]),
                                       ambient=0.5))
        light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
        return compile_scene([s1, s2, floor, ball], [light], dtype=jnp.float64)

    def test_shade_hit_transparent(self):
        # scene.rs:759-795
        scene = self.glass_floor_scene()
        r2 = np.sqrt(2.0)
        c = trace(scene, [0, 0, -3], [0, -r2 / 2, r2 / 2], remaining=2)
        np.testing.assert_allclose(c, [0.93642, 0.68642, 0.68642], atol=1e-4)

    def test_shade_hit_reflective_transparent(self):
        # scene.rs:797-832 (Schlick blending)
        scene = self.glass_floor_scene(reflective=0.5)
        r2 = np.sqrt(2.0)
        c = trace(scene, [0, 0, -3], [0, -r2 / 2, r2 / 2], remaining=2)
        np.testing.assert_allclose(
            c, [0.9259077639258646, 0.6864251822976762, 0.6764160604069138],
            atol=2e-4)


class TestCamera:
    def test_pixel_size(self):
        cam = Camera(200, 125, np.pi / 2)
        assert abs(cam.pixel_size - 0.01) < 1e-9
        cam = Camera(125, 200, np.pi / 2)
        assert abs(cam.pixel_size - 0.01) < 1e-9

    def test_ray_through_center(self):
        # camera.rs:174-189
        cam = compile_camera(Camera(201, 101, np.pi / 2), jnp.float64)
        ro, rd = rays_for_pixels(cam, jnp.asarray([100]), jnp.asarray([50]))
        np.testing.assert_allclose(np.asarray(ro[0]), [0, 0, 0], atol=1e-9)
        np.testing.assert_allclose(np.asarray(rd[0]), [0, 0, -1], atol=1e-9)

    def test_ray_through_corner(self):
        cam = compile_camera(Camera(201, 101, np.pi / 2), jnp.float64)
        ro, rd = rays_for_pixels(cam, jnp.asarray([0]), jnp.asarray([0]))
        np.testing.assert_allclose(np.asarray(rd[0]),
                                   [0.66519, 0.33259, -0.66851], atol=1e-5)

    def test_ray_with_transformed_camera(self):
        cam_h = Camera(201, 101, np.pi / 2)
        cam_h.transform = mu.rotate_y(np.pi / 4) @ mu.translate(0, -2, 5)
        cam = compile_camera(cam_h, jnp.float64)
        ro, rd = rays_for_pixels(cam, jnp.asarray([100]), jnp.asarray([50]))
        r2 = np.sqrt(2) / 2
        np.testing.assert_allclose(np.asarray(ro[0]), [0, 2, -5], atol=1e-9)
        np.testing.assert_allclose(np.asarray(rd[0]), [r2, 0, -r2], atol=1e-9)


class TestRefractiveIndices:
    def test_n1_n2_sequence(self):
        # ray.rs:256-296: three nested/overlapping glass spheres
        def glass(transform, ior):
            return Shape("sphere", transform=transform,
                         material=Material(transparency=1.0,
                                           refractive_index=ior))

        a = glass(mu.scale(2, 2, 2), 1.5)
        b = glass(mu.translate(0, 0, -0.25), 2.0)
        c = glass(mu.translate(0, 0, 0.25), 2.5)
        light = PointLight(np.zeros(3), np.ones(3))
        scene = compile_scene([a, b, c], [light], dtype=jnp.float64)
        ro = jnp.asarray([[0.0, 0.0, -4.0]], jnp.float64)
        rd = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float64)
        slots = hits_mod.gather_sorted_hits(scene, ro, rd, SET)
        expected = [(1.0, 1.5), (1.5, 2.0), (2.0, 2.5),
                    (2.5, 2.5), (2.5, 1.5), (1.5, 1.0)]
        for idx, (e1, e2) in enumerate(expected):
            n1, n2 = hits_mod.refractive_indices(
                scene, slots, jnp.asarray([idx]), SET.containers_depth)
            assert abs(float(n1[0]) - e1) < 1e-9, (idx, float(n1[0]), e1)
            assert abs(float(n2[0]) - e2) < 1e-9, (idx, float(n2[0]), e2)

    def test_deep_nesting_exceeds_configured_depth(self):
        """Five nested glass spheres with containers_depth=2: the
        containers stack is floored at the scene's prim count, so a
        too-small configured depth can't corrupt the walk (a dropped
        entry's exit used to be mis-pushed as an enter). Both the AoS
        walk and the SoA scan must produce the exact sequence."""
        from rray_tpu.ops import soa as soa_mod

        iors = [1.1, 1.2, 1.3, 1.4, 1.5]
        shapes = [Shape("sphere", transform=mu.scale(s, s, s),
                        material=Material(transparency=1.0,
                                          refractive_index=ior))
                  for s, ior in zip([5, 4, 3, 2, 1], iors)]
        light = PointLight(np.zeros(3), np.ones(3))
        scene = compile_scene(shapes, [light], dtype=jnp.float64)
        ro = jnp.asarray([[0.0, 0.0, -8.0]], jnp.float64)
        rd = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float64)
        shallow = RenderSettings(containers_depth=2)
        slots = hits_mod.gather_sorted_hits(scene, ro, rd, shallow)
        # Entering: n1 = previous innermost, n2 = this sphere's ior;
        # exiting (slots 5..9): mirror image.
        expected = [(1.0, 1.1), (1.1, 1.2), (1.2, 1.3), (1.3, 1.4),
                    (1.4, 1.5), (1.5, 1.4), (1.4, 1.3), (1.3, 1.2),
                    (1.2, 1.1), (1.1, 1.0)]
        for idx, (e1, e2) in enumerate(expected):
            n1, n2 = hits_mod.refractive_indices(
                scene, slots, jnp.asarray([idx]), shallow.containers_depth)
            assert abs(float(n1[0]) - e1) < 1e-9, (idx, float(n1[0]), e1)
            assert abs(float(n2[0]) - e2) < 1e-9, (idx, float(n2[0]), e2)

        from rray_tpu.ops.vec import V3
        ro_s = V3(jnp.asarray([0.0]), jnp.asarray([0.0]), jnp.asarray([-8.0]))
        rd_s = V3(jnp.asarray([0.0]), jnp.asarray([0.0]), jnp.asarray([1.0]))
        sslots = soa_mod.sorted_slots_soa(scene, ro_s, rd_s)
        for idx, (e1, e2) in enumerate(expected):
            n1, n2 = soa_mod.refractive_indices_soa(
                scene, sslots, jnp.asarray([idx]),
                shallow.containers_depth)
            assert abs(float(n1[0]) - e1) < 1e-9, (idx, float(n1[0]), e1)
            assert abs(float(n2[0]) - e2) < 1e-9, (idx, float(n2[0]), e2)
