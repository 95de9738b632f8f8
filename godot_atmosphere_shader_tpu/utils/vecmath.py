"""Structure-of-arrays 3D vector math shared by the pure-JAX and Pallas paths.

The reference renderer does all of its work in per-pixel GLSL ``vec3`` math
(``/root/reference/addons/zylann.atmosphere/shaders/include/util.gdshaderinc``).
On TPU the natural layout is structure-of-arrays: each component is a full
``(H, W)`` plane living in (8, 128)-tiled vector registers, so every ``Vec3``
operation below is a plain VPU elementwise op.  The same code runs unchanged
under ``jit``, inside ``shard_map`` and inside Pallas kernels.
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax.numpy as jnp

Scalar = Union[float, jnp.ndarray]


class Vec3(NamedTuple):
    """SoA 3-vector: x, y, z are arrays of identical shape (or scalars)."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # -- arithmetic ---------------------------------------------------------
    def __add__(self, o: "Vec3") -> "Vec3":
        return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o: "Vec3") -> "Vec3":
        return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __neg__(self) -> "Vec3":
        return Vec3(-self.x, -self.y, -self.z)

    def __mul__(self, s: Scalar) -> "Vec3":
        return Vec3(self.x * s, self.y * s, self.z * s)

    __rmul__ = __mul__

    def cmul(self, o: "Vec3") -> "Vec3":
        """Component-wise product (GLSL ``a * b`` on vec3)."""
        return Vec3(self.x * o.x, self.y * o.y, self.z * o.z)


def vec3(x: Scalar, y: Scalar, z: Scalar) -> Vec3:
    return Vec3(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z))


def splat(v, like=None) -> Vec3:
    """Broadcast a length-3 constant to a Vec3 (optionally shaped like an array)."""
    x, y, z = v
    if like is not None:
        ones = jnp.ones_like(like)
        return Vec3(x * ones, y * ones, z * ones)
    return vec3(x, y, z)


def dot(a: Vec3, b: Vec3) -> jnp.ndarray:
    return a.x * b.x + a.y * b.y + a.z * b.z


def length(a: Vec3) -> jnp.ndarray:
    return jnp.sqrt(dot(a, a))


def distance(a: Vec3, b: Vec3) -> jnp.ndarray:
    return length(a - b)


def normalize(a: Vec3) -> Vec3:
    inv = jax_rsqrt(dot(a, a))
    return Vec3(a.x * inv, a.y * inv, a.z * inv)


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    import jax.lax as lax

    return lax.rsqrt(x)


def cross(a: Vec3, b: Vec3) -> Vec3:
    return Vec3(
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )


def lerp(a, b, t):
    """GLSL ``mix``."""
    return a + (b - a) * t


def lerp3(a: Vec3, b: Vec3, t) -> Vec3:
    return Vec3(lerp(a.x, b.x, t), lerp(a.y, b.y, t), lerp(a.z, b.z, t))


def clamp(x, lo, hi):
    return jnp.minimum(jnp.maximum(x, lo), hi)


def saturate(x):
    return clamp(x, 0.0, 1.0)


def smoothstep(edge0, edge1, x):
    t = saturate((x - edge0) / (edge1 - edge0))
    return t * t * (3.0 - 2.0 * t)


def pow2(x):
    return x * x


def pow3(x):
    return x * x * x


def pow4(x):
    x2 = x * x
    return x2 * x2


# -- ray intersectors -------------------------------------------------------

#: Sentinel returned by :func:`ray_sphere` on a miss.  The reference returns
#: ``vec2(1e6, 1e6)`` and tests hits with ``x != y``
#: (``util.gdshaderinc:20-40``); we keep that convention so downstream
#: clamping math is identical.
RAY_SPHERE_MISS = 1.0e6


def ray_sphere(center: Vec3, radius, ray_origin: Vec3, ray_dir: Vec3):
    """Ray/sphere intersection with the reference's miss convention.

    Returns ``(t_near, t_far)`` arrays; both equal ``RAY_SPHERE_MISS`` where
    the ray misses the sphere.  ``ray_dir`` must be normalized.  Mirrors the
    quadratic-free formulation of ``util.gdshaderinc:20-40`` (a branch-free
    ``where`` replaces the GLSL early return, as TPU lanes cannot diverge).
    """
    oc = ray_origin - center
    b = dot(oc, ray_dir)
    qc = oc - ray_dir * b
    h = radius * radius - dot(qc, qc)
    miss = h < 0.0
    # double-where keeps sqrt's gradient finite on missed lanes (the renderer
    # is differentiable end-to-end for inverse-rendering / training steps)
    sq = jnp.sqrt(jnp.where(miss, 1.0, jnp.maximum(h, 1e-12)))
    t0 = jnp.where(miss, RAY_SPHERE_MISS, -b - sq)
    t1 = jnp.where(miss, RAY_SPHERE_MISS, -b + sq)
    return t0, t1


def ray_sphere_hit(t0, t1):
    """Hit mask matching the reference's ``rs.x != rs.y`` test."""
    return t0 != t1


def ray_box(ray_origin: Vec3, ray_dir: Vec3, box_half_size: Vec3):
    """Axis-aligned box intersection (``util.gdshaderinc:5-17``).

    Box is centered at the origin; ``box_half_size`` holds half extents.
    Returns ``(t_near, t_far, hit_mask)``; ``(-1, -1)`` convention on miss.
    """

    def safe_inv(d):
        # guard axis-aligned rays: 1/0 → ±inf then 0·inf → NaN poisons the
        # min/max lattice; a huge finite slope behaves identically
        tiny = 1e-12
        d = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
        return 1.0 / d

    inv = Vec3(safe_inv(ray_dir.x), safe_inv(ray_dir.y), safe_inv(ray_dir.z))
    n = inv.cmul(ray_origin)
    k = Vec3(jnp.abs(inv.x), jnp.abs(inv.y), jnp.abs(inv.z)).cmul(box_half_size)
    t1 = -n - k
    t2 = -n + k
    t_near = jnp.maximum(jnp.maximum(t1.x, t1.y), t1.z)
    t_far = jnp.minimum(jnp.minimum(t2.x, t2.y), t2.z)
    hit = jnp.logical_and(t_near <= t_far, t_far >= 0.0)
    t_near = jnp.where(hit, t_near, -1.0)
    t_far = jnp.where(hit, t_far, -1.0)
    return t_near, t_far, hit


# -- color blending ---------------------------------------------------------


def blend_colors(self_rgb: Vec3, self_a, over_rgb: Vec3, over_a):
    """Premultiplied-style alpha blend from ``util.gdshaderinc:61-69``.

    Returns ``(rgb, a)``.  The GLSL divides by the combined alpha and returns
    transparent black when it is zero; we guard the division branch-free.
    """
    sa = 1.0 - over_a
    a = self_a * sa + over_a
    safe = jnp.where(a == 0.0, 1.0, a)
    rgb = (self_rgb * (self_a * sa) + over_rgb * over_a) * (1.0 / safe)
    zero = a == 0.0
    rgb = Vec3(
        jnp.where(zero, 0.0, rgb.x),
        jnp.where(zero, 0.0, rgb.y),
        jnp.where(zero, 0.0, rgb.z),
    )
    return rgb, a
