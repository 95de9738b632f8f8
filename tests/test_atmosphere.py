"""v1/v2 integrator properties and parity between OD modes."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from godot_atmosphere_shader_tpu.models.params import AtmosphereParams, VARIANTS
from godot_atmosphere_shader_tpu.ops.atmosphere_v1 import compute_atmosphere_v1
from godot_atmosphere_shader_tpu.ops.atmosphere_v2 import (
    compute_atmosphere_v2, scattering_coefficients)
from godot_atmosphere_shader_tpu.ops.optical_depth import bake_optical_depth
from godot_atmosphere_shader_tpu.render.atmosphere_pass import atmosphere_pass
from godot_atmosphere_shader_tpu.utils.camera import Camera, look_at
from godot_atmosphere_shader_tpu.utils.vecmath import vec3


def _params(**kw):
    return AtmosphereParams.create(planet_radius=100.0, atmosphere_height=8.0,
                                   sun_position=(0.0, 0.0, 600.0), density=0.5,
                                   scattering_strength=1.0, **kw)


def test_scattering_coefficients_default():
    p = AtmosphereParams.create()
    c = scattering_coefficients(p)
    # pow4(400/700)*20, pow4(400/530)*20, pow4(400/440)*20
    np.testing.assert_allclose(float(c[0]), (400 / 700) ** 4 * 20, rtol=1e-5)
    np.testing.assert_allclose(float(c[2]), (400 / 440) ** 4 * 20, rtol=1e-5)


def test_v1_zero_length_march_is_empty():
    p = _params()
    rgb, alpha = compute_atmosphere_v1(
        vec3(0.0, 0.0, 200.0), vec3(0.0, 0.0, -1.0), vec3(0.0, 0.0, 0.0),
        jnp.float32(50.0), jnp.float32(50.0), vec3(1.0, 0.0, 0.0), p, 16)
    assert float(alpha) == 0.0


def test_v2_alpha_bounds_and_dither_cap():
    """alpha ∈ [0, 0.99] (atmosphere_funcs_v2.gdshaderinc:96)."""
    p = _params()
    h = w = 32
    cam = Camera.create(look_at((0.0, 0.0, 156.0), (0.0, 0.0, 0.0)))
    rgb, alpha, mask = atmosphere_pass(p, VARIANTS["no_clouds"], cam, h, w)
    a = np.asarray(alpha)
    assert (a >= 0).all() and (a <= 0.99).all()
    assert np.asarray(mask).any()
    for c in (rgb.x, rgb.y, rgb.z):
        arr = np.asarray(c)
        assert np.isfinite(arr).all() and (arr >= 0).all()


def test_v2_lut_vs_analytic_close_on_average():
    """LUT mode carries the reference's discretization error; the analytic
    mode is exact — they must agree closely in the mean."""
    h = w = 48
    cam = Camera.create(look_at((0.0, 40.0, 180.0), (0.0, 0.0, 0.0)))
    p_ana = _params()
    cfg_ana = VARIANTS["no_clouds"]
    rgb_a, al_a, m = atmosphere_pass(p_ana, cfg_ana, cam, h, w)

    lut = bake_optical_depth(100.0, 8.0, 0.5)
    p_lut = dataclasses.replace(p_ana, optical_depth_lut=lut)
    cfg_lut = dataclasses.replace(cfg_ana, od_mode="lut")
    rgb_l, al_l, _ = atmosphere_pass(p_lut, cfg_lut, cam, h, w)

    mask = np.asarray(m)
    diff = np.abs(np.asarray(rgb_a.x) - np.asarray(rgb_l.x))[mask]
    assert diff.mean() < 0.01
    # alpha path has no LUT dependence at all → identical
    np.testing.assert_allclose(np.asarray(al_a), np.asarray(al_l), atol=1e-6)


def test_v2_ambient_floor():
    """u_atmosphere_ambient_color is added before the clamp (:91)."""
    p = _params(atmosphere_ambient_color=(0.25, 0.0, 0.0), colors_are_srgb=False)
    rgb, alpha = compute_atmosphere_v2(
        vec3(0.0, 0.0, 200.0), vec3(0.0, 0.0, -1.0), vec3(0.0, 0.0, 0.0),
        jnp.float32(0.0), jnp.float32(0.0), vec3(1.0, 0.0, 0.0),
        jnp.float32(0.0), p, 8, od_mode="analytic")
    np.testing.assert_allclose(float(rgb.x), 0.25, atol=1e-6)


def test_v1_day_night_mix():
    """Sun-facing side uses day colors, far side night colors."""
    p = _params(day_color0=(1.0, 0.0, 0.0), day_color1=(1.0, 0.0, 0.0),
                night_color0=(0.0, 0.0, 1.0), night_color1=(0.0, 0.0, 1.0),
                colors_are_srgb=False)
    h = w = 32
    cam = Camera.create(look_at((0.0, 0.0, 300.0), (0.0, 0.0, 0.0)))
    cfg = VARIANTS["v1_no_clouds"]
    rgb, alpha, mask = atmosphere_pass(p, cfg, cam, h, w)
    m = np.asarray(mask)
    red = np.asarray(rgb.x)[m].mean()
    blue = np.asarray(rgb.z)[m].mean()
    assert red > blue  # sun at +z behind camera → facing side is day
