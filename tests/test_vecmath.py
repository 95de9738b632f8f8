"""Core math vs closed forms (SURVEY.md §4 unit tests)."""

import jax.numpy as jnp
import numpy as np

from godot_atmosphere_shader_tpu.utils.vecmath import (
    RAY_SPHERE_MISS, Vec3, blend_colors, dot, length, normalize, pow2, pow3,
    pow4, ray_box, ray_sphere, ray_sphere_hit, smoothstep, vec3)


def _np_ray_sphere(center, radius, ro, rd):
    oc = np.asarray(ro) - np.asarray(center)
    b = float(np.dot(oc, rd))
    c = float(np.dot(oc, oc)) - radius * radius
    disc = b * b - c
    if disc < 0:
        return None
    s = np.sqrt(disc)
    return -b - s, -b + s


def test_ray_sphere_matches_quadratic():
    rng = np.random.default_rng(0)
    for _ in range(100):
        center = rng.normal(size=3) * 10
        radius = rng.random() * 5 + 0.1
        ro = rng.normal(size=3) * 10
        rd = rng.normal(size=3)
        rd /= np.linalg.norm(rd)
        t0, t1 = ray_sphere(vec3(*center), radius, vec3(*ro), vec3(*rd))
        expected = _np_ray_sphere(center, radius, ro, rd)
        if expected is None:
            assert float(t0) == RAY_SPHERE_MISS and float(t1) == RAY_SPHERE_MISS
            assert not bool(ray_sphere_hit(t0, t1))
        else:
            np.testing.assert_allclose(float(t0), expected[0], atol=2e-3)
            np.testing.assert_allclose(float(t1), expected[1], atol=2e-3)
            assert bool(ray_sphere_hit(t0, t1))


def test_ray_sphere_inside():
    # camera inside the sphere: t0 < 0 < t1
    t0, t1 = ray_sphere(vec3(0.0, 0.0, 0.0), 5.0, vec3(1.0, 0.0, 0.0),
                        vec3(1.0, 0.0, 0.0))
    assert float(t0) == -6.0 and float(t1) == 4.0


def test_ray_sphere_miss_convention():
    # matches util.gdshaderinc:36 — vec2(1e6) so x != y is the hit test
    t0, t1 = ray_sphere(vec3(0.0, 10.0, 0.0), 1.0, vec3(0.0, 0.0, 0.0),
                        vec3(1.0, 0.0, 0.0))
    assert float(t0) == 1e6 and float(t1) == 1e6


def test_ray_box():
    half = vec3(1.0, 2.0, 3.0)
    t0, t1, hit = ray_box(vec3(-5.0, 0.0, 0.0), vec3(1.0, 0.0, 0.0), half)
    assert bool(hit) and float(t0) == 4.0 and float(t1) == 6.0
    _, _, hit2 = ray_box(vec3(-5.0, 5.0, 0.0), vec3(1.0, 0.0, 0.0), half)
    assert not bool(hit2)


def test_blend_colors_identities():
    base = Vec3(jnp.float32(0.3), jnp.float32(0.5), jnp.float32(0.7))
    # blending transparent over anything is a no-op
    rgb, a = blend_colors(base, jnp.float32(0.8),
                          Vec3(jnp.float32(0.9), jnp.float32(0.1),
                               jnp.float32(0.2)), jnp.float32(0.0))
    np.testing.assert_allclose([float(rgb.x), float(rgb.y), float(rgb.z)],
                               [0.3, 0.5, 0.7], atol=1e-6)
    np.testing.assert_allclose(float(a), 0.8)
    # blending an opaque color replaces
    rgb2, a2 = blend_colors(base, jnp.float32(0.8),
                            Vec3(jnp.float32(0.9), jnp.float32(0.1),
                                 jnp.float32(0.2)), jnp.float32(1.0))
    np.testing.assert_allclose([float(rgb2.x), float(rgb2.y), float(rgb2.z)],
                               [0.9, 0.1, 0.2], atol=1e-6)
    np.testing.assert_allclose(float(a2), 1.0)
    # zero-alpha-everywhere returns transparent black (GLSL guard :64-65)
    rgb3, a3 = blend_colors(base, jnp.float32(0.0), base, jnp.float32(0.0))
    assert float(a3) == 0.0 and float(rgb3.x) == 0.0


def test_helpers():
    assert float(pow2(jnp.float32(3.0))) == 9.0
    assert float(pow3(jnp.float32(2.0))) == 8.0
    assert float(pow4(jnp.float32(2.0))) == 16.0
    assert float(smoothstep(0.0, 1.0, jnp.float32(0.5))) == 0.5
    v = normalize(vec3(3.0, 4.0, 0.0))
    np.testing.assert_allclose(float(length(v)), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(dot(v, v)), 1.0, atol=1e-6)
