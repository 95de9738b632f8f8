"""Scene save/load round-trip (config tier 3: scene files)."""

import numpy as np

from godot_atmosphere_shader_tpu.models.demo import build_demo_scene
import pytest

from godot_atmosphere_shader_tpu.models.serialization import (
    atmosphere_from_dict, atmosphere_to_dict, load_scene, save_scene)


def test_atmosphere_roundtrip():
    scene = build_demo_scene(variant="clouds", procedural=True)
    atmo = scene.atmospheres[0]
    d = atmosphere_to_dict(atmo)
    back = atmosphere_from_dict(d)
    assert back.planet_radius == atmo.planet_radius
    assert back.atmosphere_height == atmo.atmosphere_height
    assert back.config == atmo.config
    for name in ("u_density", "u_scattering_strength", "u_cloud_top",
                 "u_atmosphere_modulate", "u_cloud_shape_invert"):
        np.testing.assert_allclose(
            np.asarray(back.get_shader_parameter(name)),
            np.asarray(atmo.get_shader_parameter(name)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back.sun.position),
                               np.asarray(atmo.sun.position))


def test_scene_file_roundtrip(tmp_path):
    scene = build_demo_scene(variant="no_clouds")
    p = str(tmp_path / "scene.json")
    save_scene(scene, p)
    back = load_scene(p)
    assert len(back.atmospheres) == 1
    a0, a1 = scene.atmospheres[0], back.atmospheres[0]
    assert a0.config == a1.config
    np.testing.assert_allclose(a1.transform, a0.transform)
    # opaque geometry round-trips too (ground/sun/moon/box + lighting)
    np.testing.assert_allclose(np.asarray(back.opaque.sphere_centers),
                               np.asarray(scene.opaque.sphere_centers))
    np.testing.assert_allclose(np.asarray(back.opaque.box_half_sizes),
                               np.asarray(scene.opaque.box_half_sizes))
    np.testing.assert_allclose(float(back.opaque.star_intensity),
                               float(scene.opaque.star_intensity))


@pytest.mark.slow
def test_textures_not_serialized():
    """NoiseCubemap deliberately does not persist images
    (noise_cubemap.gd:84-90); scene dicts behave the same."""
    scene = build_demo_scene(variant="clouds", procedural=False)
    d = atmosphere_to_dict(scene.atmospheres[0])
    assert "u_cloud_shape_texture" not in d["shader_params"]
    assert "u_cloud_coverage_cubemap" not in d["shader_params"]
