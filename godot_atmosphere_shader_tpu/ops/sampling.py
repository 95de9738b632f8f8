"""Texture sampling: bilinear 2D, trilinear 3D (repeat), cubemap.

These replace the engine sampler hardware the reference gets for free
(``SURVEY.md §2.2``): clamped bilinear for the optical-depth LUT
(``repeat_disable``), wrapped trilinear for the 3D cloud shape texture
(``repeat_enable``), and seamless-ish cubemap filtering for the coverage
``NoiseCubemap``.

They lower to XLA gathers, which run at only ~0.1 G/s on TPU — fine for
tests, bakes and small reference renders, far too slow for the per-step
cloud fetches at 1080p.  The production path recomputes procedural noise
instead (``ops/noise.py``); these functions define the semantics that path
must visually match.

Cube face layout follows the reference's own generator
(``/root/reference/addons/zylann.atmosphere/noise_cubemap.gd:110-128``):
faces ordered +X, -X, +Y, -Y, +Z, -Z with its exact basis swizzles, so a
cubemap baked by ``bake_noise_cubemap`` and sampled here round-trips.
Per-face clamp-to-edge stands in for GL's seam filtering (documented delta).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.vecmath import Vec3, normalize
from .noise import NoiseSpec, sample_noise3
from .optical_depth import sample_bilinear_clamp  # re-export  # noqa: F401


def sample_trilinear_repeat(tex: jnp.ndarray, x, y, z) -> jnp.ndarray:
    """GL ``texture()`` on a ``sampler3D`` with ``repeat_enable``.

    ``tex`` is ``[D(z), H(y), W(x)]``; coords are normalized (1.0 = one
    period).  Texel centers at ``(i + 0.5)/N``.
    """
    d, h, w = tex.shape

    def prep(c, n):
        t = c * n - 0.5
        i0 = jnp.floor(t)
        f = t - i0
        i0 = jnp.mod(i0.astype(jnp.int32), n)
        i1 = jnp.mod(i0 + 1, n)
        return i0, i1, f

    x0, x1, fx = prep(x, w)
    y0, y1, fy = prep(y, h)
    z0, z1, fz = prep(z, d)

    flat = tex.reshape(-1)

    def at(zi, yi, xi):
        return jnp.take(flat, (zi * h + yi) * w + xi)

    c000 = at(z0, y0, x0); c100 = at(z0, y0, x1)
    c010 = at(z0, y1, x0); c110 = at(z0, y1, x1)
    c001 = at(z1, y0, x0); c101 = at(z1, y0, x1)
    c011 = at(z1, y1, x0); c111 = at(z1, y1, x1)

    x00 = c000 + (c100 - c000) * fx
    x10 = c010 + (c110 - c010) * fx
    x01 = c001 + (c101 - c001) * fx
    x11 = c011 + (c111 - c011) * fx
    y0v = x00 + (x10 - x00) * fy
    y1v = x01 + (x11 - x01) * fy
    return y0v + (y1v - y0v) * fz


def cubemap_face_uv(direction: Vec3):
    """Direction → (face_index, u, v) in the reference's face layout.

    ``u, v ∈ [-1, 1]`` on the selected face; inverse of the generator mapping
    in ``noise_cubemap.gd:110-128``.
    """
    x, y, z = direction.x, direction.y, direction.z
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    x_major = jnp.logical_and(ax >= ay, ax >= az)
    y_major = jnp.logical_and(jnp.logical_not(x_major), ay >= az)
    z_major = jnp.logical_not(jnp.logical_or(x_major, y_major))

    face = jnp.where(x_major, jnp.where(x >= 0, 0, 1),
                     jnp.where(y_major, jnp.where(y >= 0, 2, 3),
                               jnp.where(z >= 0, 4, 5)))
    s = jnp.where(x_major, ax, jnp.where(y_major, ay, az))
    s = jnp.maximum(s, 1e-20)
    inv = 1.0 / s

    u = jnp.where(face == 0, -z,
        jnp.where(face == 1, z,
        jnp.where(face == 2, x,
        jnp.where(face == 3, x,
        jnp.where(face == 4, x, -x))))) * inv
    v = jnp.where(face == 0, y,
        jnp.where(face == 1, y,
        jnp.where(face == 2, -z,
        jnp.where(face == 3, z,
        jnp.where(face == 4, y, y))))) * inv
    return face, u, v


def sample_cubemap_bilinear(faces: jnp.ndarray, direction: Vec3) -> jnp.ndarray:
    """``texture(samplerCube, dir)`` with per-face clamp-to-edge bilinear.

    ``faces`` is ``(6, res, res)`` in the layout produced by
    ``bake_noise_cubemap``.
    """
    _, res, _ = faces.shape
    face, u, v = cubemap_face_uv(direction)

    half = res * 0.5
    # generator: pos2d = ((x+0.5)/half - 1, (res-y-0.5)/half - 1)
    px = (u + 1.0) * half - 0.5
    py = res - 0.5 - (v + 1.0) * half

    px = jnp.clip(px, 0.0, res - 1.0)
    py = jnp.clip(py, 0.0, res - 1.0)
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, res - 1)
    y1 = jnp.minimum(y0 + 1, res - 1)
    fx = px - x0.astype(jnp.float32)
    fy = py - y0.astype(jnp.float32)

    flat = faces.reshape(-1)
    base = face * (res * res)

    def at(yi, xi):
        return jnp.take(flat, base + yi * res + xi)

    top = at(y0, x0) * (1.0 - fx) + at(y0, x1) * fx
    bot = at(y1, x0) * (1.0 - fx) + at(y1, x1) * fx
    return top * (1.0 - fy) + bot * fy


def sample_equirect_bilinear(tex: jnp.ndarray, direction: Vec3) -> Vec3:
    """Equirect (lat-long) panorama sample — the PanoramaSkyMaterial analog
    (``demo/planet_atmosphere_test.tscn`` Sky/PanoramaSkyMaterial nodes).

    ``tex`` is ``(H, W, 3)`` linear RGB.  The direction→(u, v) mapping is
    identical to the in-kernel pyramid sampler
    (``ops/pallas/texsample.py::sample_latlong`` / ``latlong_dirs``):
    u = atan2(z, x)/2π + 0.5 wraps, v = 0.5 − asin(y)/π clamps at the
    poles; texel centers at (i+0.5)/N.  Exact trig here (XLA path); the
    kernel uses the documented polynomial approximation.
    """
    h, w, _ = tex.shape
    d = normalize(direction)
    u = jnp.arctan2(d.z, d.x) * (1.0 / (2.0 * jnp.pi)) + 0.5
    v = 0.5 - jnp.arcsin(jnp.clip(d.y, -1.0, 1.0)) * (1.0 / jnp.pi)

    pu = u * w - 0.5
    pv = jnp.clip(v * h - 0.5, 0.0, h - 1.0)
    x0f = jnp.floor(pu)
    y0 = jnp.floor(pv).astype(jnp.int32)
    fx = pu - x0f
    fy = pv - y0.astype(jnp.float32)
    x0 = jnp.mod(x0f.astype(jnp.int32), w)
    x1 = jnp.mod(x0 + 1, w)  # azimuth seam wraps
    y1 = jnp.minimum(y0 + 1, h - 1)  # poles clamp

    flat = tex.reshape(-1, 3)

    def at(yi, xi, c):
        return jnp.take(flat[:, c], yi * w + xi)

    out = []
    for c in range(3):
        top = at(y0, x0, c) * (1.0 - fx) + at(y0, x1, c) * fx
        bot = at(y1, x0, c) * (1.0 - fx) + at(y1, x1, c) * fx
        out.append(top * (1.0 - fy) + bot * fy)
    return Vec3(*out)


# -- bakes --------------------------------------------------------------------


def _face_dirs_from_uv(uu: jnp.ndarray, vv: jnp.ndarray) -> Vec3:
    """Face-plane (u, v) grids → unit directions for all 6 faces, stacked.

    The swizzle table from ``noise_cubemap.gd:116-128``; shared by the
    texel-center grid (:func:`cubemap_face_dirs`) and the border-extension
    grid (:func:`extend_cubemap_borders`), whose (u, v) reach beyond ±1.
    """
    inv_len = 1.0 / jnp.sqrt(1.0 + uu * uu + vv * vv)
    bx = inv_len  # (1, v, -u) normalized
    by = vv * inv_len
    bz = -uu * inv_len

    dirs = [
        (bx, by, bz),  # +X
        (-bx, by, -bz),  # -X
        (-bz, bx, -by),  # +Y
        (-bz, -bx, by),  # -Y
        (-bz, by, bx),  # +Z
        (bz, by, -bx),  # -Z
    ]
    dx = jnp.stack([d[0] for d in dirs])
    dy = jnp.stack([d[1] for d in dirs])
    dz = jnp.stack([d[2] for d in dirs])
    return Vec3(dx, dy, dz)


def cubemap_face_dirs(resolution: int):
    """Per-texel unit directions for all 6 faces, ``(6, res, res)`` components.

    Vectorization of the reference's per-pixel loop
    (``noise_cubemap.gd:101-133``).
    """
    half = 0.5 * resolution
    xs = jnp.arange(resolution, dtype=jnp.float32)
    ys = jnp.arange(resolution, dtype=jnp.float32)
    u = (xs + 0.5) / half - 1.0  # pos2d.x
    v = (resolution - ys - 1.0 + 0.5) / half - 1.0  # pos2d.y
    uu = jnp.broadcast_to(u[None, :], (resolution, resolution))
    vv = jnp.broadcast_to(v[:, None], (resolution, resolution))
    return _face_dirs_from_uv(uu, vv)


def extend_cubemap_borders(faces: jnp.ndarray) -> jnp.ndarray:
    """``(6, res, res)`` → ``(6, res+2, res+2)`` with a 1-texel border
    resampled from the adjacent faces — the bake-time half of seamless
    cube filtering (PARITY #10; GL ``samplerCube`` blends across face
    boundaries, ``cloud_funcs.gdshaderinc:45``).

    Each border texel center lies just outside the face plane (|u| or |v|
    slightly > 1); its cube point, renormalized, lands on the neighboring
    face, where the ordinary per-face clamped bilinear sampler evaluates
    it.  No adjacency/orientation tables: the direction mapping does the
    bookkeeping, and corners fall out automatically.  Interior texels are
    copied exactly, so away from the seam band
    :func:`sample_cubemap_seamless` matches
    :func:`sample_cubemap_bilinear` to 1 ulp (the +1 texel coordinate
    offset rounds the fractional weights differently; measured max
    1.2e-7, ``tests/test_seam.py``).
    """
    _, res, _ = faces.shape
    half = 0.5 * res
    idx = jnp.arange(-1, res + 1, dtype=jnp.float32)
    u = (idx + 0.5) / half - 1.0
    v = (res - idx - 1.0 + 0.5) / half - 1.0
    uu = jnp.broadcast_to(u[None, :], (res + 2, res + 2))
    vv = jnp.broadcast_to(v[:, None], (res + 2, res + 2))
    d = _face_dirs_from_uv(uu, vv)
    ext = sample_cubemap_bilinear(faces, d)
    return ext.at[:, 1:-1, 1:-1].set(faces)


def sample_cubemap_seamless(faces_ext: jnp.ndarray,
                            direction: Vec3) -> jnp.ndarray:
    """``texture(samplerCube, dir)`` with cross-face seam blending.

    ``faces_ext`` is the ``(6, res+2, res+2)`` border-extended stack from
    :func:`extend_cubemap_borders`.  Identical arithmetic to
    :func:`sample_cubemap_bilinear` except footprints that straddle a face
    edge read the adjacent face's values from the border ring instead of
    clamping — the GL seamless-filtering behavior the per-face sampler
    approximates (measured delta: ``tests/test_seam.py``).
    """
    _, eres, _ = faces_ext.shape
    res = eres - 2
    face, u, v = cubemap_face_uv(direction)

    half = res * 0.5
    px = (u + 1.0) * half - 0.5 + 1.0  # +1: border ring offset
    py = res - 0.5 - (v + 1.0) * half + 1.0

    px = jnp.clip(px, 0.0, eres - 1.0)
    py = jnp.clip(py, 0.0, eres - 1.0)
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, eres - 1)
    y1 = jnp.minimum(y0 + 1, eres - 1)
    fx = px - x0.astype(jnp.float32)
    fy = py - y0.astype(jnp.float32)

    flat = faces_ext.reshape(-1)
    base = face * (eres * eres)

    def at(yi, xi):
        return jnp.take(flat, base + yi * eres + xi)

    top = at(y0, x0) * (1.0 - fx) + at(y0, x1) * fx
    bot = at(y1, x0) * (1.0 - fx) + at(y1, x1) * fx
    return top * (1.0 - fy) + bot * fy


def bake_noise_cubemap(spec: NoiseSpec, scale, resolution: int) -> jnp.ndarray:
    """NoiseCubemap generation: ``density = 0.5 + 0.5·noise(dir·scale)``
    (``noise_cubemap.gd:130``), vectorized over all faces at once.

    The reference's CPU loop is "really slow" (``noise_cubemap.gd:100``);
    this is one fused elementwise kernel.
    """
    d = cubemap_face_dirs(resolution)
    sx, sy, sz = scale
    n = sample_noise3(spec, d.x * sx, d.y * sy, d.z * sz)
    return 0.5 + 0.5 * n


def bake_noise_texture3d(spec: NoiseSpec, resolution: int = 64,
                         seamless: bool = True) -> jnp.ndarray:
    """``NoiseTexture3D`` analog: noise over a voxel grid, mapped to [0, 1].

    ``seamless=True`` crossfades each axis against a period-shifted copy near
    the boundary (Godot's seamless generation differs internally; ours only
    guarantees the same *property* — wrap continuity).
    """
    idx = jnp.arange(resolution, dtype=jnp.float32)
    z = idx[:, None, None]
    y = idx[None, :, None]
    x = idx[None, None, :]
    zz = jnp.broadcast_to(z, (resolution,) * 3)
    yy = jnp.broadcast_to(y, (resolution,) * 3)
    xx = jnp.broadcast_to(x, (resolution,) * 3)

    def field(px, py, pz):
        return sample_noise3(spec, px, py, pz)

    n = field(xx, yy, zz)
    if seamless:
        p = float(resolution)
        blend_start = 0.75
        def fade(c):
            return jnp.clip((c / p - blend_start) / (1.0 - blend_start), 0.0, 1.0)
        wx, wy, wz = fade(xx), fade(yy), fade(zz)
        n = n * (1 - wx) + field(xx - p, yy, zz) * wx
        n2 = field(xx, yy - p, zz) * (1 - wx) + field(xx - p, yy - p, zz) * wx
        n = n * (1 - wy) + n2 * wy
        n3a = field(xx, yy, zz - p) * (1 - wx) + field(xx - p, yy, zz - p) * wx
        n3b = field(xx, yy - p, zz - p) * (1 - wx) + field(xx - p, yy - p, zz - p) * wx
        n3 = n3a * (1 - wy) + n3b * wy
        n = n * (1 - wz) + n3 * wz
    return 0.5 + 0.5 * n
