"""Golden-image comparisons against the reference renderer's own output
PNGs (shipped alongside their YAML scenes in the reference repo's
examples/). Skipped when the reference checkout isn't available.

Tolerances are loose where scenes sample Perlin noise (FastNoiseLite
reimplementation) and tight elsewhere; failures print per-scene stats.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/examples"

CASES = [
    # (yaml, png, mean_tol, frac_tol[, row_range])
    ("objects/sphere.yaml", "objects/sphere.png", 12.0, 0.10),
    ("objects/cube.yaml", "objects/cube.png", 12.0, 0.10),
    ("objects/cylinder.yaml", "objects/cylinder.png", 12.0, 0.10),
    ("objects/cone.yaml", "objects/cone.png", 12.0, 0.10),
    # torus.png is stale vs torus.yaml in the reference repo: the YAML
    # puts the back wall at z=4 (~80 px checker cells at this camera)
    # while the PNG shows ~27 px cells (z~22, like the other scenes).
    # Compare only the torus + near-floor region, which does match.
    ("objects/torus.yaml", "objects/torus.png", 18.0, 0.20, (160, 400)),
    ("objects/triangle.yaml", "objects/triangle.png", 12.0, 0.10),
    ("patterns/stripe_pattern.yaml", "patterns/stripe_pattern.png", 6.0, 0.05),
    ("patterns/gradient_pattern.yaml", "patterns/gradient_pattern.png", 6.0, 0.05),
    ("patterns/ring_pattern.yaml", "patterns/ring_pattern.png", 6.0, 0.05),
    ("patterns/checker_pattern.yaml", "patterns/checker_pattern.png", 6.0, 0.05),
    ("patterns/blend_pattern.yaml", "patterns/blend_pattern.png", 6.0, 0.05),
    ("patterns/noise_pattern.yaml", "patterns/noise_pattern.png", 12.0, 0.15),
    ("patterns/perturbed_pattern.yaml", "patterns/perturbed_pattern.png",
     12.0, 0.15),
]


def available():
    return [c for c in CASES
            if os.path.exists(os.path.join(REF, c[0]))
            and os.path.exists(os.path.join(REF, c[1]))]


@pytest.mark.parametrize("case", available(), ids=[c[0] for c in available()])
def test_golden(case):
    yaml_rel, png_rel, mean_tol, frac_tol = case[:4]
    rows = case[4] if len(case) > 4 else None
    from PIL import Image

    from rray_tpu.api import render_scene_from_file
    from rray_tpu.render.canvas import to_u8

    ref = np.asarray(Image.open(os.path.join(REF, png_rel)).convert("RGB"),
                     np.float64)
    h, w = ref.shape[:2]
    img = render_scene_from_file(os.path.join(REF, yaml_rel), w, h, "",
                                 aa=1, dtype=jnp.float32)
    ours = to_u8(img).astype(np.float64)
    diff = np.abs(ours - ref).max(axis=-1)
    if rows is not None:
        diff = diff[rows[0]:rows[1]]
    mean = diff.mean()
    frac = (diff > 30).mean()
    assert mean <= mean_tol and frac <= frac_tol, (
        f"{yaml_rel}: mean={mean:.2f} (tol {mean_tol}), "
        f"frac>30={frac:.3f} (tol {frac_tol})")
