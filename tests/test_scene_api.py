"""PlanetAtmosphere node API parity (names, defaults, rebake, deprecations)."""

import dataclasses

import numpy as np
import pytest

from godot_atmosphere_shader_tpu.models.params import VARIANTS
from godot_atmosphere_shader_tpu.models.scene import Node3D, PlanetAtmosphere


def test_shader_parameter_names_and_defaults():
    atmo = PlanetAtmosphere()
    # shader-declaration defaults (SURVEY.md §2.4 table)
    assert float(atmo.get_shader_parameter("u_density")) == pytest.approx(0.2)
    assert float(atmo.get_shader_parameter("u_scattering_strength")) == 20.0
    np.testing.assert_allclose(
        np.asarray(atmo.get_shader_parameter("u_scattering_wavelengths")),
        [700.0, 530.0, 440.0])
    assert float(atmo.get_shader_parameter("u_cloud_density_scale")) == 50.0
    assert float(atmo.get_shader_parameter("u_cloud_bottom")) == pytest.approx(0.2)
    assert float(atmo.get_shader_parameter("u_cloud_top")) == pytest.approx(0.5)
    assert float(atmo.get_shader_parameter("u_cloud_shape_factor")) == pytest.approx(0.8)
    assert float(atmo.get_shader_parameter("u_sphere_depth_factor")) == 0.0
    # node defaults (planet_atmosphere.gd:106, planet_common.gdshaderinc:4-5)
    np.testing.assert_allclose(
        np.asarray(atmo.get_shader_parameter("u_sun_position")), [5000.0, 0, 0])
    assert atmo.planet_radius == 1.0
    assert atmo.atmosphere_height == pytest.approx(0.1)


def test_source_color_params_convert_srgb():
    atmo = PlanetAtmosphere()
    atmo.set_shader_parameter("u_atmosphere_modulate", (0.5, 0.5, 0.5))
    # stored linear internally...
    stored = np.asarray(atmo._params.atmosphere_modulate)
    assert stored[0] == pytest.approx(0.2140411, rel=1e-4)  # srgb 0.5 → linear
    # ...but the get/set surface round-trips in sRGB like Godot's
    got = np.asarray(atmo.get_shader_parameter("u_atmosphere_modulate"))
    assert got[0] == pytest.approx(0.5, rel=1e-4)
    # non-color params stay raw
    atmo.set_shader_parameter("u_density", 0.5)
    assert float(atmo.get_shader_parameter("u_density")) == 0.5


def test_unknown_parameter_raises():
    atmo = PlanetAtmosphere()
    with pytest.raises(KeyError):
        atmo.set_shader_parameter("u_nonsense", 1.0)


def test_deprecated_aliases_warn():
    atmo = PlanetAtmosphere()
    with pytest.warns(DeprecationWarning):
        atmo.set_shader_param("u_density", 0.4)
    with pytest.warns(DeprecationWarning):
        assert float(atmo.get_shader_param("u_density")) == pytest.approx(0.4)


def test_property_list_hides_api_params():
    """planet_atmosphere.gd:185-197: internal uniforms are hidden."""
    atmo = PlanetAtmosphere()
    props = atmo.get_property_list()
    assert "shader_params/u_density" in props
    assert "shader_params/u_planet_radius" not in props
    assert "shader_params/u_blue_noise_texture" not in props
    assert "shader_params/u_optical_depth_texture" not in props


def test_configuration_warnings():
    atmo = PlanetAtmosphere()
    assert atmo.get_configuration_warnings() == [
        "The path to the sun is not assigned."]
    atmo.sun = Node3D(position=(1.0, 2.0, 3.0))
    assert atmo.get_configuration_warnings() == []


def test_lut_rebake_on_param_change():
    """LUT-mode variants rebake when R/H/density change, and only then."""
    cfg = dataclasses.replace(VARIANTS["no_clouds"], od_mode="lut")
    atmo = PlanetAtmosphere(custom_shader=cfg)
    atmo._lut_cache.resolution = 16  # keep the test fast
    atmo._lut_cache.steps = 8
    atmo.build_params()
    assert atmo._lut_cache.bake_count == 1
    atmo.build_params()
    assert atmo._lut_cache.bake_count == 1
    atmo.set_shader_parameter("u_density", 0.7)
    atmo.build_params()
    assert atmo._lut_cache.bake_count == 2
    atmo.planet_radius = 2.0
    atmo.build_params()
    assert atmo._lut_cache.bake_count == 3
    atmo.atmosphere_height = 0.3
    atmo.build_params()
    assert atmo._lut_cache.bake_count == 4
    # analytic variants never bake
    atmo2 = PlanetAtmosphere(custom_shader="no_clouds")
    atmo2.build_params()
    assert atmo2._lut_cache.bake_count == 0


def test_update_drives_uniforms():
    sun = Node3D(position=(10.0, 20.0, 30.0))
    atmo = PlanetAtmosphere(sun=sun, position=(5.0, 0.0, 0.0),
                            clouds_rotation_speed=90.0)
    atmo.update(1.0, camera=None)
    np.testing.assert_allclose(
        np.asarray(atmo.get_shader_parameter("u_sun_position")), [10, 20, 30])
    w2m = np.asarray(atmo.get_shader_parameter("u_world_to_model_matrix"))
    np.testing.assert_allclose(w2m[:3, 3], [-5.0, 0.0, 0.0])
    rot = np.asarray(atmo.get_shader_parameter("u_cloud_coverage_rotation"))
    # 90°/s for 1s → quarter turn
    np.testing.assert_allclose(rot, [[0.0, -1.0], [1.0, 0.0]], atol=1e-6)
    assert float(atmo.get_shader_parameter("u_optical_depth_texture")
                 is None or True)
