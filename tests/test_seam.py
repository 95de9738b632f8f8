"""Cubemap seam-filtering delta, measured (PARITY #10 / VERDICT r2 #8).

GL's ``samplerCube`` blends across face boundaries; our XLA sampler clamps
per face (``ops/sampling.py:103-134``), and the in-kernel texture path
re-grids the cubemap to lat-long.  Until now the delta was only *stated*;
these tests measure it against a dense analytic ground truth and pin the
envelope, the same measured-bound culture as the knot/LOD deltas.

Method: bake a cubemap of a smooth analytic field (band-limited spherical
harmonics-ish trig products, so texel values carry no bake error), then
compare each sampler's output against the field itself on (a) directions
within ~1.5 texels of a face boundary ("seam set") and (b) everything else
("interior set").  The seam error bounds what the missing cross-face blend
can cost; the interior error is the ordinary bilinear filter floor.
"""

import numpy as np
import pytest

from godot_atmosphere_shader_tpu.ops.sampling import (cubemap_face_dirs,
                                                      cubemap_face_uv,
                                                      extend_cubemap_borders,
                                                      sample_cubemap_bilinear,
                                                      sample_cubemap_seamless)
from godot_atmosphere_shader_tpu.utils.vecmath import Vec3

RES = 64


def field(x, y, z):
    """Smooth, band-limited analytic test field on the sphere."""
    return np.float32(0.5 + 0.25 * np.sin(3.0 * x) * np.cos(2.0 * y)
                      + 0.15 * np.sin(2.0 * z + 0.7)
                      + 0.1 * np.cos(4.0 * x * y))


@pytest.fixture(scope="module")
def faces():
    d = cubemap_face_dirs(RES)
    return np.asarray(field(np.asarray(d.x), np.asarray(d.y),
                            np.asarray(d.z)), np.float32)


def _dirs(n=20000, seed=11):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    return (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)


def _seam_mask(d):
    """Directions whose face-local footprint touches a face border
    (within 1.5 texels of |u|=1 or |v|=1)."""
    import jax.numpy as jnp

    face, u, v = cubemap_face_uv(Vec3(jnp.asarray(d[:, 0]),
                                      jnp.asarray(d[:, 1]),
                                      jnp.asarray(d[:, 2])))
    texel = 2.0 / RES
    u = np.asarray(u)
    v = np.asarray(v)
    return np.maximum(np.abs(u), np.abs(v)) > 1.0 - 1.5 * texel


def test_seam_delta_measured_and_bounded(faces):
    import jax.numpy as jnp

    d = _dirs()
    got = np.asarray(sample_cubemap_bilinear(
        jnp.asarray(faces), Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]),
                                 jnp.asarray(d[:, 2]))))
    truth = field(d[:, 0], d[:, 1], d[:, 2])
    err = np.abs(got - truth)
    seam = _seam_mask(d)
    assert seam.sum() > 500 and (~seam).sum() > 500

    interior_p99 = float(np.percentile(err[~seam], 99))
    interior_max = float(err[~seam].max())
    seam_p99 = float(np.percentile(err[seam], 99))
    seam_max = float(err[seam].max())

    # Measured at 64² faces (2026-08, this harness):
    #   interior p99 = 2.7e-4, max = 4.0e-4  (pure bilinear filter floor)
    #   seam     p99 = 2.3e-3, max = 3.5e-3  (clamp-instead-of-blend)
    # i.e. the missing cross-face blend costs ~9× the filter floor in the
    # worst case but stays under ONE uint8 level (3.9e-3) — invisible in
    # 8-bit output, and confined to the 1.5-texel border band (~9% of
    # directions at 64²).  Pinned with ~2× headroom:
    assert interior_max < 1e-3, interior_max
    assert seam_p99 < 5e-3, seam_p99
    assert seam_max < 7e-3, seam_max


def test_seamless_sampler_closes_the_seam(faces):
    """The r4 seamless sampler (PARITY #10 implemented): border-extending
    the cubemap from adjacent faces drops the seam-band error to the
    interior bilinear filter floor, matches per-face clamp to 1 ulp on
    interior footprints, and removes the cross-edge discontinuity.

    Measured at 64² faces (2026-08, this harness):
      clamp    seam max 3.5e-3 / p99 2.3e-3, edge step-jump 2.5e-3
      seamless seam max 4.1e-4 / p99 8.9e-5, edge step-jump 1.6e-5
      interior |clamp − seamless| max 1.2e-7 (1 ulp of ~0.9 values)
    """
    import jax.numpy as jnp

    d = _dirs()
    dv = Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]),
              jnp.asarray(d[:, 2]))
    ext = extend_cubemap_borders(jnp.asarray(faces))
    assert ext.shape == (6, RES + 2, RES + 2)
    # interior of the extended stack is the original texels, bit-exact
    np.testing.assert_array_equal(np.asarray(ext)[:, 1:-1, 1:-1], faces)

    got = np.asarray(sample_cubemap_seamless(ext, dv))
    clamp = np.asarray(sample_cubemap_bilinear(jnp.asarray(faces), dv))
    truth = field(d[:, 0], d[:, 1], d[:, 2])
    err = np.abs(got - truth)
    seam = _seam_mask(d)

    # seam error collapses to the interior filter floor (clamp: 3.5e-3)
    assert float(err[seam].max()) < 1e-3, err[seam].max()
    assert float(np.percentile(err[seam], 99)) < 3e-4
    # interior footprints: 1-ulp agreement with the per-face sampler
    assert float(np.abs(got - clamp)[~seam].max()) < 1e-6

    # continuity: tiny steps across the +X/+Z edge must not jump
    t = np.linspace(-0.002, 0.002, 41, dtype=np.float32)
    dirs = np.stack([1.0 + t, np.full_like(t, 0.3), 1.0 - t], axis=1)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dd = Vec3(jnp.asarray(dirs[:, 0]), jnp.asarray(dirs[:, 1]),
              jnp.asarray(dirs[:, 2]))
    jump_seamless = float(np.abs(np.diff(np.asarray(
        sample_cubemap_seamless(ext, dd)))).max())
    jump_clamp = float(np.abs(np.diff(np.asarray(
        sample_cubemap_bilinear(jnp.asarray(faces), dd)))).max())
    assert jump_seamless < 1e-4, jump_seamless
    assert jump_clamp > 10 * jump_seamless  # the defect it fixes is real


def test_latlong_regrid_seam_free(faces):
    """The in-kernel path's lat-long re-grid has no cube seams at all: its
    error vs the analytic field is uniform across former face borders
    (azimuth wrap is exact by construction, poles are the known stretch)."""
    import jax.numpy as jnp

    from godot_atmosphere_shader_tpu.ops.pallas.texsample import (
        build_latlong_pyramid)

    data, meta = build_latlong_pyramid(faces, width=256)
    h0, w0, base = meta.levels[0]
    img = np.asarray(data).reshape(-1)[: h0 * w0].reshape(h0, w0)

    d = _dirs(8000, seed=3)
    # keep away from poles where lat-long texels stretch (documented)
    keep = np.abs(d[:, 1]) < 0.95
    d = d[keep]
    u = (np.arctan2(d[:, 2], d[:, 0]) / (2 * np.pi) + 0.5) % 1.0
    v = 0.5 - np.arcsin(np.clip(d[:, 1], -1, 1)) / np.pi
    pu = u * w0 - 0.5
    pv = np.clip(v * h0 - 0.5, 0, h0 - 1)
    x0 = np.floor(pu).astype(int)
    y0 = np.floor(pv).astype(int)
    fx = pu - x0
    fy = pv - y0
    x0w, x1w = np.mod(x0, w0), np.mod(x0 + 1, w0)
    y1 = np.minimum(y0 + 1, h0 - 1)
    got = ((img[y0, x0w] * (1 - fx) + img[y0, x1w] * fx) * (1 - fy)
           + (img[y1, x0w] * (1 - fx) + img[y1, x1w] * fx) * fy)
    truth = field(d[:, 0], d[:, 1], d[:, 2])
    err = np.abs(got - truth)
    # regrid goes through the per-face sampler once at build time, so its
    # seam error is frozen into the texels; at 256-wide it stays within
    # the same half-uint8 envelope, uniformly
    assert float(np.percentile(err, 99)) < 6e-3
    assert float(err.max()) < 1.5e-2