"""In-kernel texture sampler (ops/pallas/texsample.py) vs the XLA samplers.

The windowed mode at level 0 computes the *same* trilinear/bilinear
arithmetic as ``ops/sampling.py`` — those cases must match to f32 noise.
Straddling/minified batches drop to mip levels; those cases are compared
against explicitly downsampled references with the documented tolerance.
Runs in pallas interpret mode on the CPU test mesh (compiled-path parity is
covered by tools/tpu_checks.py on real hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from godot_atmosphere_shader_tpu.ops.pallas import texsample as ts
from godot_atmosphere_shader_tpu.ops.sampling import (
    sample_cubemap_bilinear, sample_trilinear_repeat)
from godot_atmosphere_shader_tpu.ops.noise import NoiseSpec, sample_noise3
from godot_atmosphere_shader_tpu.utils.vecmath import Vec3

rng = np.random.default_rng(7)


def _tex(s=32):
    return rng.random((s, s, s)).astype(np.float32)


def _run3d(data, meta, x, y, z, window_rows=48, band_rows=0,
           band_max_slices=32):
    shape = x.shape

    def kern(tab_ref, x_ref, y_ref, z_ref, o_ref):
        o_ref[:] = ts.sample_tex3d(tab_ref, meta, x_ref[:], y_ref[:], z_ref[:],
                                   window_rows=window_rows,
                                   band_rows=band_rows,
                                   band_max_slices=band_max_slices)

    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        interpret=True,
    )(jnp.asarray(data), jnp.asarray(x), jnp.asarray(y), jnp.asarray(z))


def _run_latlong(data, meta, d, window_rows=32):
    shape = d.x.shape

    def kern(tab_ref, dx_ref, dy_ref, dz_ref, o_ref):
        o_ref[:] = ts.sample_latlong(
            tab_ref, meta, Vec3(dx_ref[:], dy_ref[:], dz_ref[:]),
            window_rows=window_rows)

    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        interpret=True,
    )(jnp.asarray(data), jnp.asarray(d.x), jnp.asarray(d.y), jnp.asarray(d.z))


def test_pyramid_packing_roundtrip():
    tex = _tex(32)
    data, meta = ts.build_tex3d_pyramid(tex)
    assert meta.levels[0] == (32, 0)
    np.testing.assert_array_equal(
        np.asarray(data).reshape(-1)[:tex.size], tex.ravel())
    # level 1 = wrap-preserving box filter
    s1, base1 = meta.levels[1]
    assert s1 == 16
    lvl1 = np.asarray(data).reshape(-1)[base1 * 128:base1 * 128 + 16 ** 3]
    ref = tex.reshape(16, 2, 16, 2, 16, 2).mean(axis=(1, 3, 5))
    np.testing.assert_allclose(lvl1, ref.ravel(), rtol=1e-6)


def test_atan2_asin_poly_accuracy():
    ang = np.linspace(-np.pi + 1e-3, np.pi - 1e-3, 4001)
    y, x = np.sin(ang), np.cos(ang)
    got = np.asarray(ts.atan2_poly(jnp.asarray(y, jnp.float32),
                                   jnp.asarray(x, jnp.float32)))
    assert np.abs(got - ang).max() < 5e-5
    s = np.linspace(-0.999, 0.999, 2001)
    got = np.asarray(ts.asin_poly(jnp.asarray(s, jnp.float32)))
    assert np.abs(got - np.arcsin(s)).max() < 1e-4


def test_windowed_matches_trilinear_exactly():
    """A compact, non-straddling footprint stays at level 0 and reproduces
    the XLA trilinear sampler bit-for-bit (same arithmetic)."""
    tex = _tex(32)
    data, meta = ts.build_tex3d_pyramid(tex)
    # footprint ≈ 2 texels/axis centered mid-texture: no wrap, tiny span
    cx = 0.47 + 0.06 * rng.random((16, 128)).astype(np.float32)
    cy = 0.52 + 0.06 * rng.random((16, 128)).astype(np.float32)
    cz = 0.31 + 0.06 * rng.random((16, 128)).astype(np.float32)
    got = np.asarray(_run3d(data, meta, cx, cy, cz))
    ref = np.asarray(sample_trilinear_repeat(jnp.asarray(tex), cx, cy, cz))
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_straddling_footprint_uses_floor_level():
    """A footprint across the wrap seam falls back to the whole-level floor,
    sampled NEAREST (one lookup instead of eight — straddling batches span a
    full period, so point sampling matches the information content)."""
    tex = _tex(32)
    data, meta = ts.build_tex3d_pyramid(tex)
    floor_idx = meta.floor_level(48)
    s_floor = meta.levels[floor_idx][0]
    assert s_floor < 32  # the fallback is really a coarser level
    cx = (0.95 + 0.1 * rng.random((16, 128))).astype(np.float32)  # straddles
    cy = 0.4 + 0.05 * rng.random((16, 128)).astype(np.float32)
    cz = 0.6 + 0.05 * rng.random((16, 128)).astype(np.float32)
    got = np.asarray(_run3d(data, meta, cx, cy, cz))
    ref_tex = tex
    for _ in range(floor_idx):
        h = ref_tex.shape[0] // 2
        ref_tex = ref_tex.reshape(h, 2, h, 2, h, 2).mean(axis=(1, 3, 5))

    def near(c):
        return np.floor((c - np.floor(c)) * s_floor).astype(int) % s_floor

    ref = ref_tex[near(cz), near(cy), near(cx)]
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_minified_batch_selects_coarser_level():
    """A wide footprint (minified sampling) lands on a mip level — the
    result matches trilinear on SOME pyramid level (proper filtering), and
    is far from the aliased base-level values."""
    tex = _tex(64)
    data, meta = ts.build_tex3d_pyramid(tex)
    cx = (0.1 + 0.35 * rng.random((16, 128))).astype(np.float32)
    cy = (0.1 + 0.35 * rng.random((16, 128))).astype(np.float32)
    cz = (0.1 + 0.35 * rng.random((16, 128))).astype(np.float32)
    got = np.asarray(_run3d(data, meta, cx, cy, cz))
    errs = []
    ref_tex = tex
    for lvl in range(len(meta.levels)):
        ref = np.asarray(sample_trilinear_repeat(
            jnp.asarray(ref_tex), cx, cy, cz))
        errs.append(np.abs(got - ref).max())
        if ref_tex.shape[0] > 8:
            h = ref_tex.shape[0] // 2
            ref_tex = ref_tex.reshape(h, 2, h, 2, h, 2).mean(axis=(1, 3, 5))
    assert min(errs) < 2e-6  # exactly one level's trilinear
    assert errs[0] > 0.01  # and it is not the (undersampled) base level


def test_banded_restores_base_level_trilinear():
    """ROADMAP #9: a 1:1 close-up footprint — compact in (y, x) but spanning
    several z-slices of a 64³ texture — blows the contiguous 16-row window
    (z pitch 64² = 32 rows/slice) and used to mip down.  Banded mode loops
    the touched slices and must reproduce level-0 trilinear exactly."""
    tex = _tex(64)
    data, meta = ts.build_tex3d_pyramid(tex)
    # (y, x) ≈ 3 texels each; z spans ~5 texels → flat span ≈ 5·4096 ≫ 2048
    cx = (20.2 / 64 + (3.0 / 64) * rng.random((16, 128))).astype(np.float32)
    cy = (33.1 / 64 + (3.0 / 64) * rng.random((16, 128))).astype(np.float32)
    cz = (11.4 / 64 + (5.0 / 64) * rng.random((16, 128))).astype(np.float32)
    base = np.asarray(_run3d(data, meta, cx, cy, cz, window_rows=16))
    ref = np.asarray(sample_trilinear_repeat(jnp.asarray(tex), cx, cy, cz))
    assert np.abs(base - ref).max() > 0.01  # windowed alone mips down here
    got = np.asarray(_run3d(data, meta, cx, cy, cz, window_rows=16,
                            band_rows=16))
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_banded_slice_cap_falls_back():
    """A footprint spanning more z-slices than band_max_slices is genuinely
    minified: banded mode must decline and the result must equal the plain
    windowed/mip path (band on == band off)."""
    tex = _tex(64)
    data, meta = ts.build_tex3d_pyramid(tex)
    cx = (10.0 / 64 + (2.0 / 64) * rng.random((8, 128))).astype(np.float32)
    cy = (10.0 / 64 + (2.0 / 64) * rng.random((8, 128))).astype(np.float32)
    cz = (0.05 + 0.4 * rng.random((8, 128))).astype(np.float32)  # ~26 slices
    off = np.asarray(_run3d(data, meta, cx, cy, cz, window_rows=16))
    on = np.asarray(_run3d(data, meta, cx, cy, cz, window_rows=16,
                           band_rows=16, band_max_slices=8))
    np.testing.assert_array_equal(on, off)


def test_banded_fuzz_always_some_level_trilinear():
    """Fuzz invariant: whatever mode/level the sampler picks (windowed,
    banded, or both declining to floor-nearest), a non-straddling batch's
    output is EXACTLY one pyramid level's trilinear — no mixed or dropped
    weights.  Random footprint scales/anchors, banded on."""
    tex = _tex(64)
    data, meta = ts.build_tex3d_pyramid(tex)
    frng = np.random.default_rng(21)
    for trial in range(6):
        # random per-axis extents from sub-texel to half the texture,
        # anchored to stay inside [0, 1) (no wrap)
        ext = frng.uniform(0.01, 0.45, 3)
        lo = frng.uniform(0.02, 0.95 - ext)
        cs = [(lo[a] + ext[a] * frng.random((8, 128))).astype(np.float32)
              for a in range(3)]
        got = np.asarray(_run3d(data, meta, *cs, window_rows=16,
                                band_rows=16))
        errs = []
        ref_tex = tex
        for lvl in range(len(meta.levels)):
            tri = np.asarray(sample_trilinear_repeat(
                jnp.asarray(ref_tex), *cs))
            errs.append(np.abs(got - tri).max())
            # nearest-sampled floor level is also a legal outcome
            s_l = ref_tex.shape[0]

            def near(c, s=s_l):
                return np.floor((c - np.floor(c)) * s).astype(int) % s

            nn = ref_tex[near(cs[2]), near(cs[1]), near(cs[0])]
            errs.append(np.abs(got - nn).max())
            if ref_tex.shape[0] > 8:
                hh = ref_tex.shape[0] // 2
                ref_tex = ref_tex.reshape(hh, 2, hh, 2, hh, 2).mean(
                    axis=(1, 3, 5))
        assert min(errs) < 2e-6, (trial, ext, errs)


def test_banded_unaligned_base_keeps_weights():
    """Banded windows are 128-aligned down from each slice origin; the
    alignment slack must be budgeted (same ADVICE r2 class of bug).  A
    constant-1 texture must sample to exactly 1 at an odd (y, x) origin."""
    tex = np.ones((64, 64, 64), np.float32)
    data, meta = ts.build_tex3d_pyramid(tex)
    cx = (41.3 / 64 + (9.0 / 64) * rng.random((8, 128))).astype(np.float32)
    cy = (7.6 / 64 + (12.0 / 64) * rng.random((8, 128))).astype(np.float32)
    cz = (29.2 / 64 + (4.0 / 64) * rng.random((8, 128))).astype(np.float32)
    got = np.asarray(_run3d(data, meta, cx, cy, cz, window_rows=16,
                            band_rows=16))
    np.testing.assert_allclose(got, 1.0, atol=1e-5)


def test_latlong_matches_direct_bilinear():
    """Smooth direction batches sample the lat-long map with the same
    bilinear arithmetic as a direct (u,v) evaluation of level 0."""
    faces = rng.random((6, 64, 64)).astype(np.float32)
    data, meta = ts.build_latlong_pyramid(faces, width=256)
    h0, w0, base0 = meta.levels[0]
    img = np.asarray(data).reshape(-1)[:h0 * w0].reshape(h0, w0)

    theta = (0.3 + 0.02 * rng.random((16, 128))).astype(np.float32)
    phi = (0.2 + 0.02 * rng.random((16, 128))).astype(np.float32)
    d = Vec3(jnp.asarray(np.cos(phi) * np.cos(theta)),
             jnp.asarray(np.sin(phi)),
             jnp.asarray(np.cos(phi) * np.sin(theta)))
    got = np.asarray(_run_latlong(data, meta, d))

    u = (np.arctan2(np.asarray(d.z), np.asarray(d.x)) / (2 * np.pi) + 0.5)
    v = 0.5 - np.arcsin(np.clip(np.asarray(d.y), -1, 1)) / np.pi
    tu = u * w0 - 0.5
    tv = np.clip(v * h0 - 0.5, 0, h0 - 1)
    u0 = np.floor(tu).astype(int)
    v0 = np.floor(tv).astype(int)
    wu, wv = tu - u0, tv - v0
    v1 = np.minimum(v0 + 1, h0 - 1)
    ref = (img[v0 % h0, u0 % w0] * (1 - wv) * (1 - wu)
           + img[v0 % h0, (u0 + 1) % w0] * (1 - wv) * wu
           + img[v1, u0 % w0] * wv * (1 - wu)
           + img[v1, (u0 + 1) % w0] * wv * wu)
    np.testing.assert_allclose(got, ref, atol=3e-4)  # poly-atan2 texel error


@pytest.mark.slow
def test_near_budget_footprint_keeps_all_weights():
    """Regression (ADVICE r2 high): a footprint whose span is near the
    window budget, anchored at a non-128-aligned base, must keep every
    trilinear corner weight.  The window start is aligned down to a 128
    boundary, so the max relative index is span + (lin_min mod 128); the
    old fit check ignored that slack and _window_lookup silently dropped
    the overflowing rows' weights (constant-1 texture sampled to 0.44)."""
    tex = np.ones((64, 64, 64), np.float32)
    data, meta = ts.build_tex3d_pyramid(tex)

    def span_arr(lo, hi, shape):
        a = (lo + (hi - lo) * rng.random(shape)).astype(np.float32)
        a.flat[0] = lo
        a.flat[-1] = hi  # pin the exact footprint corners
        return a

    # z: texel i in [32, 33] (span 4096); y: i in [3, 34] (span 1984);
    # x: i in [40, 60] (span 20) -> total span 6100 of a 6144 budget at
    # window_rows=48, base (3*64+40) mod 128 = 104 rows of slack
    x = span_arr(40.7 / 64, 60.3 / 64, (8, 128))
    y = span_arr(3.7 / 64, 34.2 / 64, (8, 128))
    z = span_arr(32.6 / 64, 33.3 / 64, (8, 128))
    out = np.asarray(_run3d(data, meta, x, y, z, window_rows=48))
    np.testing.assert_allclose(out, 1.0, atol=1e-5)


def test_latlong_build_inverts_cubemap():
    """The lat-long resample reproduces the cubemap content: re-sampling the
    map at cubemap-sampled directions round-trips within filter tolerance."""
    spec = NoiseSpec(noise_type="value", seed=3, frequency=1.0)
    dirs = ts.latlong_dirs(64, 128)
    from godot_atmosphere_shader_tpu.ops.sampling import bake_noise_cubemap

    faces = bake_noise_cubemap(spec, (2.0, 2.0, 2.0), 64)
    data, meta = ts.build_latlong_pyramid(faces, width=256)
    h0, w0, _ = meta.levels[0]
    img = np.asarray(data).reshape(-1)[:h0 * w0].reshape(h0, w0)
    ref = np.asarray(sample_cubemap_bilinear(faces, dirs))
    # compare at the lat-long grid of a coarser level (away from poles)
    sub = img.reshape(64, 2, 128, 2).mean(axis=(1, 3))
    assert np.abs(sub[8:-8] - ref[8:-8]).max() < 0.05
