"""Physical property tests (SURVEY.md §4 item 3)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from godot_atmosphere_shader_tpu.models.params import AtmosphereParams, VARIANTS
from godot_atmosphere_shader_tpu.ops.atmosphere_v2 import compute_atmosphere_v2
from godot_atmosphere_shader_tpu.ops.clouds import CloudSettings, raymarch_cloud
from godot_atmosphere_shader_tpu.ops.optical_depth import optical_depth_analytic
from godot_atmosphere_shader_tpu.utils.vecmath import Vec3, vec3


def _params():
    return AtmosphereParams.create(planet_radius=100.0, atmosphere_height=8.0,
                                   density=0.5, scattering_strength=1.0)


def test_alpha_monotonic_in_march_length():
    """More atmosphere along the ray ⇒ alpha can only grow (prefix-product
    transmittance, atmosphere_funcs_v2.gdshaderinc:78-79)."""
    p = _params()
    ro = vec3(0.0, 0.0, 200.0)
    rd = vec3(0.0, 0.0, -1.0)
    center = vec3(0.0, 0.0, 0.0)
    sun = vec3(1.0, 0.0, 0.0)
    alphas = []
    for t_end in (95.0, 100.0, 105.0, 110.0):
        _, alpha = compute_atmosphere_v2(
            ro, rd, center, jnp.float32(92.0), jnp.float32(t_end), sun,
            jnp.float32(0.0), p, 8, od_mode="analytic")
        alphas.append(float(alpha))
    assert all(b >= a - 1e-6 for a, b in zip(alphas, alphas[1:])), alphas


def test_optical_depth_additive_along_ray():
    """OD(a→c) = OD(a→b) + OD(b→c) for in-shell colinear spans (integral
    additivity — sanity for the quadrature splitting)."""
    R, H, dens = 100.0, 8.0, 0.5
    center = vec3(0.0, 0.0, 0.0)
    d = vec3(1.0, 0.0, 0.0)
    a = Vec3(jnp.float32(-3.0), jnp.float32(103.0), jnp.float32(0.0))
    b = Vec3(jnp.float32(1.0), jnp.float32(103.0), jnp.float32(0.0))
    od_a = float(optical_depth_analytic(a, d, center, R, H, dens))
    od_b = float(optical_depth_analytic(b, d, center, R, H, dens))
    # OD from a = (segment a→b) + OD from b; compute segment with a dense sum
    from godot_atmosphere_shader_tpu.ops.density import atmosphere_density

    ts = np.linspace(0.0, 4.0, 4097)[:-1]
    seg = 0.0
    for t in ts:
        r = float(np.hypot(-3.0 + t, 103.0))
        seg += float(atmosphere_density(jnp.float32(r), R, H, dens)) * dens * (4.0 / 4096)
    np.testing.assert_allclose(od_a, seg + od_b, rtol=5e-3, atol=1e-3)


def test_cloud_transmittance_bounds():
    """Cloud march alpha ∈ [0,1], light ≥ 0, for random parameter draws."""
    rng = np.random.default_rng(0)
    p = _params()
    settings = CloudSettings(bottom_height=jnp.float32(101.6),
                             top_height=jnp.float32(104.8),
                             density_scale=jnp.float32(2.0),
                             ground_height=jnp.float32(100.0))

    def shape_fn(pos):
        from godot_atmosphere_shader_tpu.ops.noise import value_noise3

        return 0.5 + 0.5 * value_noise3(pos.x * 3, pos.y * 3, pos.z * 3, 1)

    def coverage_fn(pos):
        return jnp.full_like(pos.x, 0.8)

    n = 64
    ro = Vec3(jnp.asarray(rng.normal(size=n) * 5, jnp.float32),
              jnp.asarray(102.0 + rng.normal(size=n), jnp.float32),
              jnp.asarray(rng.normal(size=n) * 5, jnp.float32))
    rd = Vec3(jnp.ones(n, jnp.float32), jnp.zeros(n, jnp.float32),
              jnp.zeros(n, jnp.float32))
    light, alpha = raymarch_cloud(
        ro, rd, jnp.zeros(n, jnp.float32), jnp.full(n, 3.0, jnp.float32),
        jnp.float32(0.5), vec3(1.0, 0.0, 0.0), jnp.float32(0.0), settings, p,
        shape_fn, coverage_fn, 32, False, True)
    a = np.asarray(alpha)
    l = np.asarray(light)
    assert (a >= 0).all() and (a <= 1.0).all()
    assert (l >= 0).all() and np.isfinite(l).all()
    assert a.max() > 0.5  # dense coverage ⇒ opaque somewhere
