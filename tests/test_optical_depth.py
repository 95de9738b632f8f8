"""Optical-depth LUT bake, sampling, analytic evaluation, cache semantics."""

import jax.numpy as jnp
import numpy as np

from godot_atmosphere_shader_tpu.ops.optical_depth import (
    OpticalDepthCache, bake_optical_depth, get_baked_optical_depth,
    optical_depth_analytic, optical_depth_reference, sample_bilinear_clamp)
from godot_atmosphere_shader_tpu.utils.vecmath import Vec3, vec3

R, H, DENS = 100.0, 8.0, 0.5


def _random_shell_samples(n, rng):
    r = R + H * rng.random(n).astype(np.float32)
    theta = rng.random(n) * np.pi
    phi = rng.random(n) * 2 * np.pi
    pos = Vec3(jnp.asarray(r * np.sin(theta) * np.cos(phi), jnp.float32),
               jnp.asarray(r * np.cos(theta), jnp.float32),
               jnp.asarray(r * np.sin(theta) * np.sin(phi), jnp.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs = Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]))
    return pos, dirs


def test_bake_basic_properties():
    lut = np.asarray(bake_optical_depth(R, H, DENS, resolution=64, steps=64))
    assert lut.shape == (64, 64)
    assert np.isfinite(lut).all() and (lut >= 0).all()
    # top of atmosphere, straight up (u=1): almost no air left above
    assert lut[-1, -1] < lut[0, -1]
    # grazing/down rays (small u) pass through far more air than up rays
    assert lut[32, 5] > lut[32, -5]


def test_lut_matches_direct_integral_at_texels():
    """The LUT texel (i, j) must equal the 2D integral the bake shader
    computes for that (u, v) — cross-checked with the general 3D evaluator."""
    res = 32
    lut = np.asarray(bake_optical_depth(R, H, DENS, resolution=res, steps=64))
    rng = np.random.default_rng(2)
    for _ in range(20):
        i = int(rng.integers(res))
        j = int(rng.integers(res))
        u = (j + 0.5) / res
        v = (i + 0.5) / res
        diry = 2 * u - 1
        dirx = np.sqrt(max(1 - diry * diry, 0.0))
        pos = vec3(0.0, np.float32(R + H * v), 0.0)
        d = vec3(np.float32(dirx), np.float32(diry), 0.0)
        od = float(optical_depth_reference(pos, d, vec3(0.0, 0.0, 0.0),
                                           R, H, DENS, steps=64))
        np.testing.assert_allclose(lut[i, j], od, rtol=1e-4, atol=1e-5)


def test_analytic_matches_dense_riemann():
    """Quadrature path ≈ 4096-step ground truth (≪ the LUT's own error)."""
    rng = np.random.default_rng(0)
    pos, dirs = _random_shell_samples(512, rng)
    center = vec3(0.0, 0.0, 0.0)
    ana = np.asarray(optical_depth_analytic(pos, dirs, center, R, H, DENS))
    ref = np.asarray(optical_depth_reference(pos, dirs, center, R, H, DENS,
                                             steps=4096))
    np.testing.assert_allclose(ana, ref, rtol=2e-3, atol=1e-3)


def test_lut_sampling_approximates_integral():
    rng = np.random.default_rng(3)
    pos, dirs = _random_shell_samples(256, rng)
    center = vec3(0.0, 0.0, 0.0)
    lut = bake_optical_depth(R, H, DENS)
    sampled = np.asarray(get_baked_optical_depth(pos, dirs, center, lut, R, H))
    ref = np.asarray(optical_depth_reference(pos, dirs, center, R, H, DENS,
                                             steps=64))
    # bilinear LUT error is the reference's own; just bound it loosely
    assert np.abs(sampled - ref).mean() < 0.02


def test_bilinear_clamp_exact_at_texel_centers():
    rng = np.random.default_rng(4)
    tex = jnp.asarray(rng.random((8, 8), np.float32))
    for i in (0, 3, 7):
        for j in (0, 5, 7):
            u = (j + 0.5) / 8
            v = (i + 0.5) / 8
            got = float(sample_bilinear_clamp(tex, jnp.float32(u), jnp.float32(v)))
            np.testing.assert_allclose(got, float(tex[i, j]), rtol=1e-6)
    # clamp at the borders
    got = float(sample_bilinear_clamp(tex, jnp.float32(-1.0), jnp.float32(2.0)))
    np.testing.assert_allclose(got, float(tex[7, 0]), rtol=1e-6)


def test_cache_rebake_semantics():
    """planet_atmosphere.gd:79-81,230-253 — rebake only on R/H/density change."""
    cache = OpticalDepthCache(resolution=16, steps=8)
    cache.get(1.0, 0.1, 0.2)
    assert cache.bake_count == 1
    cache.get(1.0, 0.1, 0.2)
    assert cache.bake_count == 1  # no change → no rebake
    cache.get(1.0, 0.1, 0.3)
    assert cache.bake_count == 2  # density changed
    cache.get(2.0, 0.1, 0.3)
    assert cache.bake_count == 3  # radius changed
    cache.get(1.0, 0.1, 0.2)
    assert cache.bake_count == 3  # cached key
