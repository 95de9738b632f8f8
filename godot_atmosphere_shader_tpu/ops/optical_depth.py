"""Optical-depth transmittance LUT: bake, sampling, and cache.

The reference bakes a 256×256 lookup texture in a hidden SubViewport with a
two-frame state machine and an RGBA8→R32F bit-cast readback
(``/root/reference/addons/zylann.atmosphere/optical_depth_baker.gd``,
``shaders/optical_depth.gdshader``).  Here the whole dance is one jitted
function: parameters in, ``f32[res, res]`` out, no readback, no encoding hack.

LUT parameterization (``optical_depth.gdshader:45-69``):
    u = 0.5 + 0.5·dot(up, dir)     (ray elevation against local up)
    v = height ratio in the shell
Each texel integrates density along the ray through the shell with a 64-step
left-endpoint Riemann sum — including the extra ``· u_density`` factor at
``optical_depth.gdshader:27`` which makes the bake ∝ density² (kept for
frame parity).

Also provides ``optical_depth_reference`` (the same integral for arbitrary 3D
rays, used by tests) and a param-keyed cache mirroring the rebake-on-change
semantics of ``planet_atmosphere.gd:79-81,230-253``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.vecmath import Vec3, vec3, ray_sphere
from .density import atmosphere_density

LUT_RESOLUTION = 256  # optical_depth_baker.gd:24
LUT_BAKE_STEPS = 64  # optical_depth.gdshader:18


@functools.partial(jax.jit, static_argnames=("resolution", "steps"))
def bake_optical_depth(planet_radius, atmosphere_height, density,
                       resolution: int = LUT_RESOLUTION,
                       steps: int = LUT_BAKE_STEPS) -> jnp.ndarray:
    """Bake the optical-depth LUT.  Returns ``f32[resolution, resolution]``.

    Rows index height ratio (v), columns index ray elevation (u), matching the
    canvas UV layout the bake shader writes and
    ``get_baked_optical_depth``'s ``vec2(uvx, height_ratio)`` read
    (``atmosphere_funcs_v2.gdshaderinc:28``).
    """
    planet_radius = jnp.asarray(planet_radius, jnp.float32)
    atmosphere_height = jnp.asarray(atmosphere_height, jnp.float32)
    density = jnp.asarray(density, jnp.float32)

    u = (jnp.arange(resolution, dtype=jnp.float32)[None, :] + 0.5) / resolution
    v = (jnp.arange(resolution, dtype=jnp.float32)[:, None] + 0.5) / resolution
    u = jnp.broadcast_to(u, (resolution, resolution))
    v = jnp.broadcast_to(v, (resolution, resolution))

    # uv → 2D ray (optical_depth.gdshader:48-55); the third component is 0.
    dir_y = 2.0 * u - 1.0
    dir_x = jnp.sqrt(jnp.maximum(1.0 - dir_y * dir_y, 0.0))
    pos_y = planet_radius + atmosphere_height * v

    origin = Vec3(jnp.zeros_like(pos_y), pos_y, jnp.zeros_like(pos_y))
    direction = Vec3(dir_x, dir_y, jnp.zeros_like(dir_x))
    center = vec3(0.0, 0.0, 0.0)

    t0, t1 = ray_sphere(center, planet_radius + atmosphere_height, origin, direction)
    ray_len = t1 - jnp.maximum(t0, 0.0)

    # 64-step left-endpoint sum (optical_depth.gdshader:17-31), including the
    # extra ·density making the LUT ∝ density².
    step_len = ray_len / float(steps)

    def body(i, od):
        t = step_len * i.astype(jnp.float32)
        px = origin.x + direction.x * t
        py = origin.y + direction.y * t
        d = jnp.sqrt(px * px + py * py)
        dens = atmosphere_density(d, planet_radius, atmosphere_height, density)
        return od + dens * step_len * density

    return jax.lax.fori_loop(0, steps, body, jnp.zeros_like(ray_len))


def sample_bilinear_clamp(tex: jnp.ndarray, u, v) -> jnp.ndarray:
    """GL ``texture()`` with clamp-to-edge (``repeat_disable``) on a 2D map.

    ``tex`` is ``[rows=v, cols=u]``; texel centers sit at ``(i + 0.5)/N``.
    XLA lowers the four ``jnp.take`` gathers natively on TPU.
    """
    rows, cols = tex.shape
    x = jnp.clip(u * cols - 0.5, 0.0, cols - 1.0)
    y = jnp.clip(v * rows - 0.5, 0.0, rows - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, cols - 1)
    y1 = jnp.minimum(y0 + 1, rows - 1)
    fx = x - x0.astype(jnp.float32)
    fy = y - y0.astype(jnp.float32)
    flat = tex.reshape(-1)
    v00 = jnp.take(flat, y0 * cols + x0)
    v01 = jnp.take(flat, y0 * cols + x1)
    v10 = jnp.take(flat, y1 * cols + x0)
    v11 = jnp.take(flat, y1 * cols + x1)
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def get_baked_optical_depth(pos: Vec3, direction: Vec3, planet_center: Vec3,
                            lut: jnp.ndarray, planet_radius, atmosphere_height):
    """``get_baked_optical_depth`` (``atmosphere_funcs_v2.gdshaderinc:14-29``)."""
    rel = pos - planet_center
    dist = jnp.sqrt(rel.x * rel.x + rel.y * rel.y + rel.z * rel.z)
    height = dist - planet_radius
    height_ratio = jnp.clip(height / atmosphere_height, 0.0, 1.0)
    inv = 1.0 / dist
    up_dot_dir = (rel.x * direction.x + rel.y * direction.y + rel.z * direction.z) * inv
    uvx = 0.5 + 0.5 * up_dot_dir
    return sample_bilinear_clamp(lut, uvx, height_ratio)


def optical_depth_reference(pos: Vec3, direction: Vec3, planet_center: Vec3,
                            planet_radius, atmosphere_height, density,
                            steps: int = LUT_BAKE_STEPS):
    """Direct (non-LUT) evaluation of the same integral for arbitrary 3D rays.

    Used by tests to validate the LUT parameterization and by the analytic
    path's golden checks.  Matches the bake's left-endpoint sum and its
    ``· density`` factor.
    """
    t0, t1 = ray_sphere(planet_center, planet_radius + atmosphere_height, pos, direction)
    ray_len = jnp.where(t0 != t1, t1 - jnp.maximum(t0, 0.0), 0.0)
    step_len = ray_len / float(steps)

    def body(i, od):
        p = pos + direction * (step_len * i.astype(jnp.float32))
        rel = p - planet_center
        d = jnp.sqrt(rel.x * rel.x + rel.y * rel.y + rel.z * rel.z)
        dens = atmosphere_density(d, planet_radius, atmosphere_height, density)
        return od + dens * step_len * density

    return jax.lax.fori_loop(0, steps, body, jnp.zeros_like(ray_len))


# 16-point Gauss-Legendre nodes/weights on [0, 1].
_GL16_X = (
    0.005299532504175031, 0.0277124884633837, 0.06718439880608412,
    0.12229779582249845, 0.19106187779867811, 0.27099161117138633,
    0.35919822461037054, 0.4524937450811813, 0.5475062549188188,
    0.6408017753896295, 0.7290083888286137, 0.8089381222013219,
    0.8777022041775016, 0.9328156011939159, 0.9722875115366163,
    0.9947004674958249,
)
_GL16_W = (
    0.013576229705877047, 0.03112676196932395, 0.04757925584124639,
    0.06231448562776694, 0.07479799440828837, 0.08457825969750127,
    0.09130170752246179, 0.0947253052275343, 0.0947253052275343,
    0.09130170752246179, 0.08457825969750127, 0.07479799440828837,
    0.06231448562776694, 0.04757925584124639, 0.03112676196932395,
    0.013576229705877047,
)


def optical_depth_analytic(pos: Vec3, direction: Vec3, planet_center: Vec3,
                           planet_radius, atmosphere_height, density,
                           quad_points: int = 8, clamp_to_shell: bool = True):
    """Gather-free optical depth: the TPU fast path's LUT replacement.

    Evaluates the *same* integral the 256×256 LUT approximates
    (``optical_depth.gdshader:17-31``, incl. its extra ``· density``) but in
    closed form per sample: the ray's radial profile is split at the ground
    crossings (where the reference's ``clamp`` kinks the cubic density into a
    constant), the below-surface span contributes ``density²·length`` exactly,
    and each smooth span integrates with fixed-order Gauss–Legendre
    quadrature (the cubic-in-height integrand is analytic there, so 16 points
    are effectively exact).  Pure VPU arithmetic — measured XLA gathers run at
    ~0.1 G/s on v5e while this is ~500 flops/sample, so recomputation beats
    the texture lookup by orders of magnitude.  Unlike the LUT it has no
    bilinear/Riemann discretization error.
    """
    rel = pos - planet_center
    ra = planet_radius + atmosphere_height

    if clamp_to_shell:
        # Reproduce the LUT's parameterization semantics: ``height_ratio`` is
        # clamped to [0, 1] (``get_baked_optical_depth``,
        # ``atmosphere_funcs_v2.gdshaderinc:21``), so samples below the
        # surface or above the shell behave as if radially projected onto it
        # — including the reference's acknowledged below-surface bug (:25-26).
        r = jnp.sqrt(rel.x * rel.x + rel.y * rel.y + rel.z * rel.z)
        r_clamped = jnp.clip(r, planet_radius, ra)
        scale = r_clamped / jnp.maximum(r, 1e-20)
        rel = rel * scale

    b = rel.x * direction.x + rel.y * direction.y + rel.z * direction.z
    c0 = rel.x * rel.x + rel.y * rel.y + rel.z * rel.z
    q2 = jnp.maximum(c0 - b * b, 0.0)

    # shell span [s, e] along the ray (from the sample position forward);
    # double-where guards keep gradients finite on tangent/missed lanes
    ha = ra * ra - q2
    shell_hit = ha > 0.0
    sq_a = jnp.sqrt(jnp.where(shell_hit, jnp.maximum(ha, 1e-12), 1.0))
    sq_a = jnp.where(shell_hit, sq_a, 0.0)
    s = jnp.maximum(-b - sq_a, 0.0)
    e = jnp.maximum(-b + sq_a, 0.0)
    e = jnp.where(shell_hit, e, s)

    # ground span, clamped into [s, e]; a miss collapses to zero length
    hg = planet_radius * planet_radius - q2
    ground_hit = hg > 0.0
    sq_g = jnp.sqrt(jnp.where(ground_hit, jnp.maximum(hg, 1e-12), 1.0))
    sq_g = jnp.where(ground_hit, sq_g, 0.0)
    g0 = jnp.where(ground_hit, -b - sq_g, e)
    g1 = jnp.where(ground_hit, -b + sq_g, e)
    g0 = jnp.clip(g0, s, e)
    g1 = jnp.clip(g1, s, e)

    dens2 = density * density

    # 8 points match the f32 error floor already (tests sweep the order);
    # nodes become trace-time constants.
    if quad_points == 16:
        nodes, weights = _GL16_X, _GL16_W
    else:
        import numpy as _np

        xs, ws = _np.polynomial.legendre.leggauss(quad_points)
        nodes = tuple((xs + 1.0) * 0.5)
        weights = tuple(ws * 0.5)

    inv_h = 1.0 / atmosphere_height

    def smooth_segment(a0, a1):
        length = a1 - a0
        acc = jnp.zeros_like(length)
        for xn, wn in zip(nodes, weights):
            t = a0 + length * xn
            x = t + b
            r = jnp.sqrt(x * x + q2)
            y = 1.0 - jnp.clip((r - planet_radius) * inv_h, 0.0, 1.0)
            acc = acc + wn * (y * y * y)
        return acc * length * dens2

    below = (g1 - g0) * dens2  # constant max density below the surface
    return smooth_segment(s, g0) + smooth_segment(g1, e) + below


class OpticalDepthCache:
    """Rebake-on-change semantics of the reference node.

    The reference rebakes when ``u_density``, ``planet_radius`` or
    ``atmosphere_height`` change (``planet_atmosphere.gd:79-81,217-218,
    230-253``).  Keying a host-side dict on those values gives identical
    behavior without the two-frame SubViewport state machine.
    """

    def __init__(self, resolution: int = LUT_RESOLUTION, steps: int = LUT_BAKE_STEPS):
        self._cache = {}
        self.resolution = resolution
        self.steps = steps
        self.bake_count = 0

    def get(self, planet_radius: float, atmosphere_height: float, density: float):
        key = (float(planet_radius), float(atmosphere_height), float(density))
        lut = self._cache.get(key)
        if lut is None:
            lut = bake_optical_depth(*key, resolution=self.resolution, steps=self.steps)
            self._cache[key] = lut
            self.bake_count += 1
        return lut
