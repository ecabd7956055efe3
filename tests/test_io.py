"""Scene IO: YAML loader semantics, OBJ parsing, canvas quantization, CLI."""
import os
import textwrap

import jax.numpy as jnp
import numpy as np
import pytest

from rray_tpu import Material
from rray_tpu import mathutils as mu
from rray_tpu.io import yaml_loader
from rray_tpu.io.obj_loader import load_obj_str, parse_obj
from rray_tpu.render import canvas


class TestTransforms:
    def test_listed_order_applies_first(self):
        # scene_builder_yaml.rs:218-224: reversed right-multiplication means
        # the listed transforms apply to points in listed order.
        m = yaml_loader.create_transforms([
            {"type": "translate", "amount": [1, 0, 0]},
            {"type": "scale", "amount": [2, 2, 2]},
        ])
        p = m @ np.array([0.0, 0.0, 0.0, 1.0])
        np.testing.assert_allclose(p[:3], [2, 0, 0])

    def test_rotation_in_degrees(self):
        m = yaml_loader.create_matrix({"type": "rotate", "axis": "y",
                                       "angle": 90})
        p = m @ np.array([0.0, 0.0, 1.0, 1.0])
        np.testing.assert_allclose(p[:3], [1, 0, 0], atol=1e-12)

    def test_shear(self):
        m = yaml_loader.create_matrix(
            {"type": "shear", "xy": 1, "xz": 0, "yx": 0, "yz": 0,
             "zx": 0, "zy": 0})
        p = m @ np.array([2.0, 3.0, 4.0, 1.0])
        np.testing.assert_allclose(p[:3], [5, 3, 4])


class TestViewTransform:
    def test_default_is_identity(self):
        m = mu.view_transform([0, 0, 0], [0, 0, -1], [0, 1, 0])
        np.testing.assert_allclose(m, np.eye(4), atol=1e-12)

    def test_positive_z_is_mirror(self):
        m = mu.view_transform([0, 0, 0], [0, 0, 1], [0, 1, 0])
        np.testing.assert_allclose(m, mu.scale(-1, 1, -1), atol=1e-12)

    def test_moves_world(self):
        m = mu.view_transform([0, 0, 8], [0, 0, 0], [0, 1, 0])
        np.testing.assert_allclose(m, mu.translate(0, 0, -8), atol=1e-12)

    def test_arbitrary(self):
        m = mu.view_transform([1, 3, 2], [4, -2, 8], [1, 1, 0])
        expected = np.array([
            [-0.50709, 0.50709, 0.67612, -2.36643],
            [0.76772, 0.60609, 0.12122, -2.82843],
            [-0.35857, 0.59761, -0.71714, 0.00000],
            [0.0, 0.0, 0.0, 1.0],
        ])
        np.testing.assert_allclose(m, expected, atol=1e-5)


SCENE_YAML = """
camera:
  fov: 60
  from: [0, 1.5, -5.0]
  to: [0, 1, 0]
  up: [0, 1, 0]
lights:
  - type: point
    position: [-10, 10, -10]
    color: [1, 1, 1]
  - type: area
    corner: [-5, 5, -5]
    uvec: [1.5, 0, 0]
    vvec: [0, 1.5, 0]
    level: 3
    color: [1, 0.5, 1]
scene:
  - type: sphere
    transforms:
      - type: translate
        amount: [0, 1, 0]
    material:
      pattern:
        type: checker
        color_a: [1, 1, 1]
        color_b: [0, 0, 0]
      ambient: 0.2
  - type: glass_sphere
  - type: cylinder
    minimum: 0
    maximum: 2
    closed: true
  - type: plane
    hidden: true
  - type: csg
    operation: difference
    left:
      type: cube
    right:
      type: torus
      minor_radius: 0.5
"""


class TestYamlLoader:
    def test_full_scene(self):
        camera_spec, lights, shapes = yaml_loader.load_scene_str(SCENE_YAML)
        assert abs(camera_spec["fov"] - np.pi / 3) < 1e-12
        assert len(lights) == 2
        assert lights[1].level == 3
        # hidden plane dropped at load
        assert [s.kind for s in shapes] == ["sphere", "sphere", "cylinder",
                                            "csg"]
        # Reference quirk: create_shape overwrites the glass preset with
        # the YAML material (defaults here) — scene_builder_yaml.rs:363-364.
        glass = shapes[1]
        assert glass.material.transparency == 0.0
        assert glass.material.refractive_index == 1.0
        cyl = shapes[2]
        assert cyl.minimum == 0 and cyl.maximum == 2 and cyl.closed
        csg = shapes[3]
        assert csg.operation == "difference"
        assert csg.left.kind == "cube" and csg.right.kind == "torus"
        assert csg.right.minor_radius == 0.5
        sphere = shapes[0]
        assert sphere.material.ambient == 0.2
        assert sphere.material.diffuse == 0.9  # default
        assert sphere.material.pattern.ptype == "checker"

    def test_sub_pattern_color_takes_parent_transform(self):
        p = yaml_loader.create_pattern({
            "type": "stripe",
            "transforms": [{"type": "scale", "amount": [2, 2, 2]}],
            "color_a": [1, 0, 0],
            "color_b": [0, 1, 0],
        }, ".")
        np.testing.assert_allclose(p.a.transform, mu.scale(2, 2, 2))

    def test_no_lights_raises(self):
        bad = SCENE_YAML.replace("lights:", "nolights:").split("scene:")[0]
        with pytest.raises(Exception):
            yaml_loader.load_scene_str(bad + "\nlights: []\nscene: []")


OBJ_TEXT = """
# comment and gibberish lines are ignored
hello world
v -1 1 0
v -1 0 0
v 1 0 0
v 1 1 0
f 1 2 3
f 1 3 4
"""

OBJ_POLY = """
v -1 1 0
v -1 0 0
v 1 0 0
v 1 1 0
v 0 2 0
f 1 2 3 4 5
"""

OBJ_NORMALS = """
v 0 1 0
v -1 0 0
v 1 0 0
vn -1 0 0
vn 1 0 0
vn 0 1 0
f 1//3 2//1 3//2
"""

OBJ_GROUPS = """
v -1 1 0
v -1 0 0
v 1 0 0
v 1 1 0
g FirstGroup
f 1 2 3
g SecondGroup
f 1 3 4
"""


class TestObjLoader:
    def test_triangles(self):
        g = load_obj_str(OBJ_TEXT, Material())
        assert g.kind == "group"
        assert len(g.children) == 2
        t1 = g.children[0]
        np.testing.assert_allclose(t1.p1, [-1, 1, 0])
        np.testing.assert_allclose(t1.p2, [-1, 0, 0])
        np.testing.assert_allclose(t1.p3, [1, 0, 0])

    def test_fan_triangulation(self):
        g = load_obj_str(OBJ_POLY, Material())
        assert len(g.children) == 3
        for tri in g.children:
            np.testing.assert_allclose(tri.p1, [-1, 1, 0])

    def test_normals_make_smooth_triangles(self):
        g = load_obj_str(OBJ_NORMALS, Material())
        t = g.children[0]
        assert t.kind == "smooth_triangle"
        np.testing.assert_allclose(t.n1, [0, 1, 0])
        np.testing.assert_allclose(t.n2, [-1, 0, 0])

    def test_named_groups_nest_under_master(self):
        g = load_obj_str(OBJ_GROUPS, Material())
        assert g.kind == "group"
        assert len(g.children) == 2
        assert all(c.kind == "group" for c in g.children)

    def test_reference_teapot_low_two_hundred_forty(self):
        path = "/root/reference/examples/teapot-low.obj"
        if not os.path.exists(path):
            pytest.skip("reference fixture unavailable")
        with open(path) as f:
            g = load_obj_str(f.read(), Material())
        def count(shape):
            if shape.kind in ("triangle", "smooth_triangle"):
                return 1
            return sum(count(c) for c in shape.children)
        assert count(g) == 240  # load_obj.rs:153-158


class TestCanvas:
    def test_u8_truncating_saturating(self):
        img = np.array([[[0.5, 1.5, -0.5]]])
        out = canvas.to_u8(img)
        np.testing.assert_array_equal(out[0, 0], [127, 255, 0])

    def test_downsample_box(self):
        img = np.zeros((2, 2, 3))
        img[0, 0] = [1, 1, 1]
        out = canvas.downsample(img, 2)
        np.testing.assert_allclose(out[0, 0], [0.25, 0.25, 0.25])

    def test_png_roundtrip(self, tmp_path):
        img = np.random.default_rng(0).uniform(size=(4, 6, 3))
        path = str(tmp_path / "out.png")
        canvas.write_png(path, img)
        back = canvas.read_image(path)
        assert back.shape == (4, 6, 3)
        np.testing.assert_allclose(back, np.trunc(img * 255) / 255, atol=1 / 255)


class TestCLI:
    def test_aa_validation(self):
        from rray_tpu.cli import build_parser
        p = build_parser()
        with pytest.raises(SystemExit):
            p.parse_args(["-s", "x.yaml", "-a", "6"])
        with pytest.raises(SystemExit):
            p.parse_args(["-s", "x.yaml", "-a", "zero"])
        args = p.parse_args(["-W", "100", "-H", "50", "-s", "x.yaml",
                             "-o", "y.png", "-a", "5"])
        assert (args.width, args.height, args.aa) == (100, 50, 5)

    def test_end_to_end_render(self, tmp_path):
        scene = textwrap.dedent("""
            camera: {fov: 60, from: [0, 1.5, -5], to: [0, 1, 0], up: [0, 1, 0]}
            lights:
              - {type: point, position: [-10, 10, -10], color: [1, 1, 1]}
            scene:
              - type: sphere
                transforms: [{type: translate, amount: [0, 1, 0]}]
                material: {pattern: {type: solid, color: [1, 0, 0]}}
        """)
        from rray_tpu.api import render_scene_from_str
        out = str(tmp_path / "out.png")
        img = render_scene_from_str(scene, 16, 12, out, aa=2)
        assert img.shape == (12, 16, 3)
        assert os.path.exists(out)
        # Sphere in the middle should be lit red-ish.
        assert img[:, :, 0].max() > 0.5
