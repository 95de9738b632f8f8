"""Golden-render regression tests: the five BASELINE.json configs.

Compares fresh renders against committed statistics (tests/goldens.json,
regenerate deliberately with tools/make_goldens.py).  Region means catch
spatial regressions; overall stats catch global drift.
"""

import json
import os

import numpy as np
import pytest

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens.json")

pytestmark = pytest.mark.skipif(not os.path.exists(GOLDENS),
                                reason="goldens not generated yet")


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDENS) as f:
        return json.load(f)


def _region_means(img, ny=4, nx=6):
    h, w = img.shape[:2]
    out = []
    for i in range(ny):
        for j in range(nx):
            block = img[i * h // ny:(i + 1) * h // ny,
                        j * w // nx:(j + 1) * w // nx]
            out.append(float(block.mean()))
    return np.array(out)


def _check(img, ref, atol=5e-3, name=None):
    np.testing.assert_allclose(float(img.mean()), ref["mean"], atol=atol)
    np.testing.assert_allclose(float(img.std()), ref["std"], atol=atol)
    gray = img.mean(axis=-1) if img.ndim == 3 else img
    np.testing.assert_allclose(_region_means(gray), np.array(ref["regions"]),
                               atol=2e-2)
    if name is not None:
        _check_image(img, name)


def _check_image(img, name):
    """Per-pixel tier against the committed golden PNG: catches localized
    spatial artifacts (seam, band, offset clouds) that region statistics
    let through.  ±2 uint8 levels absorbs quantization + compiler drift."""
    from godot_atmosphere_shader_tpu.utils.image_io import read_png, to_uint8

    path = os.path.join(os.path.dirname(__file__), "golden_images",
                        f"{name}.png")
    golden = read_png(path).astype(np.int16)
    got = to_uint8(np.clip(img, 0.0, 1.0)).astype(np.int16)
    diff = np.abs(got - golden)
    assert diff.max() <= 2, (
        f"{name}: {int((diff > 2).sum())} px exceed tolerance, "
        f"max diff {int(diff.max())} uint8 levels")


def _render(scene, pose, hw=(96, 144)):
    from godot_atmosphere_shader_tpu.models.demo import demo_camera

    cam = demo_camera(pose)
    scene.update(0.0, cam)
    return np.asarray(scene.render(cam, hw[0], hw[1])["color"])


def test_golden_v1_exterior(goldens):
    from godot_atmosphere_shader_tpu.models.demo import build_demo_scene

    _check(_render(build_demo_scene("v1_no_clouds"), "exterior"),
           goldens["v1_exterior"], name="v1_exterior")


def test_golden_v2_exterior_and_lut(goldens):
    from godot_atmosphere_shader_tpu.models.demo import build_demo_scene
    from godot_atmosphere_shader_tpu.ops.optical_depth import bake_optical_depth

    _check(_render(build_demo_scene("no_clouds"), "exterior"),
           goldens["v2_exterior"], name="v2_exterior")
    lut = np.asarray(bake_optical_depth(100.0, 8.0, 0.5))[..., None]
    _check(lut, goldens["lut"], atol=1e-2)


@pytest.mark.slow
def test_golden_clouds_space(goldens):
    from godot_atmosphere_shader_tpu.models.demo import build_demo_scene

    _check(_render(build_demo_scene("clouds"), "space"),
           goldens["clouds_space"], name="clouds_space")


@pytest.mark.slow
def test_golden_clouds_high_interior(goldens):
    from godot_atmosphere_shader_tpu.models.demo import build_demo_scene

    _check(_render(build_demo_scene("clouds_high"), "interior"),
           goldens["clouds_high_interior"], name="clouds_high_interior")


@pytest.mark.slow
def test_golden_rm_multiplanet(goldens):
    from godot_atmosphere_shader_tpu.models.demo import build_demo_scene
    from godot_atmosphere_shader_tpu.models.scene import PlanetAtmosphere

    scene = build_demo_scene("clouds_high_rm")
    sun = scene.atmospheres[0].sun
    scene.atmospheres.append(PlanetAtmosphere(
        planet_radius=10.0, atmosphere_height=2.0, sun=sun,
        custom_shader="v1_no_clouds", position=(-188.991, 0.0, 192.584)))
    _check(_render(scene, "space"), goldens["rm_multiplanet_space"],
           name="rm_multiplanet_space")
