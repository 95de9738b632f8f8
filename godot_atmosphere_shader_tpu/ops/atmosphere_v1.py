"""v1 "lite" atmosphere: the non-physical 4-color model.

Reference: ``/root/reference/addons/zylann.atmosphere/shaders/include/atmosphere_funcs_v1.gdshaderinc``.
A fixed-step march accumulates an extinction-ish ``factor *= (1 - density·dt)``
and a squared sun-facing term; four user colors are mixed by the resulting
atmosphere and day factors.  All arithmetic is elementwise over pixel planes
(VPU-only); the step loop is unrolled at trace time since step counts are
static per variant (16 for the v1 shaders).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.vecmath import Vec3, dot, lerp, lerp3, saturate
from .density import atmosphere_density


def atmo_factor_v1(ray_origin: Vec3, ray_dir: Vec3, planet_center: Vec3,
                   t_begin, t_end, sun_dir: Vec3,
                   planet_radius, atmosphere_height, density, steps: int,
                   unroll: bool = False):
    """``get_atmo_factor`` (:15-45): returns ``(atmo_factor, light_factor)``.

    ``unroll`` unrolls the march at trace time — cost-analysis use only
    (XLA's cost model counts a ``while`` body once, not ×trip-count)."""
    import jax.lax as lax

    inv_steps = 1.0 / float(steps)
    step_len = (t_end - t_begin) * inv_steps
    pos0 = ray_origin + ray_dir * t_begin

    def body(_, carry):
        px, py, pz, factor, light_sum = carry
        pos = Vec3(px, py, pz)
        rel = pos - planet_center
        d = jnp.sqrt(dot(rel, rel))
        inv_d = 1.0 / d
        up = rel * inv_d

        dens = atmosphere_density(d, planet_radius, atmosphere_height, density)

        light = saturate(1.2 * dot(sun_dir, up) + 0.5)
        light = light * light

        light_sum = light_sum + light * inv_steps
        factor = factor * (1.0 - dens * step_len)
        pos = pos + ray_dir * step_len
        return pos.x, pos.y, pos.z, factor, light_sum

    carry = (pos0.x, pos0.y, pos0.z, jnp.ones_like(t_begin),
             jnp.zeros_like(t_begin))
    _, _, _, factor, light_sum = lax.fori_loop(0, steps, body, carry,
                                               unroll=bool(unroll))

    return 1.0 - factor, light_sum


def compute_atmosphere_v1(ray_origin: Vec3, ray_dir: Vec3, planet_center: Vec3,
                          t_begin, t_end, sun_dir: Vec3, params, steps: int,
                          unroll: bool = False):
    """``compute_atmosphere`` (:48-63): returns ``(rgb: Vec3, alpha)``.

    ``params`` needs: ``planet_radius``, ``atmosphere_height``, ``density``,
    ``day_color0/1``, ``night_color0/1`` (linear-space (3,) arrays) and
    ``day_night_transition_scale``.
    """
    atmo_factor, light_factor = atmo_factor_v1(
        ray_origin, ray_dir, planet_center, t_begin, t_end, sun_dir,
        params.planet_radius, params.atmosphere_height, params.density, steps,
        unroll=unroll)

    n0, n1 = params.night_color0, params.night_color1
    d0, d1 = params.day_color0, params.day_color1
    night = Vec3(lerp(n0[0], n1[0], atmo_factor),
                 lerp(n0[1], n1[1], atmo_factor),
                 lerp(n0[2], n1[2], atmo_factor))
    day = Vec3(lerp(d0[0], d1[0], atmo_factor),
               lerp(d0[1], d1[1], atmo_factor),
               lerp(d0[2], d1[2], atmo_factor))

    day_factor = saturate(light_factor * params.day_night_transition_scale)
    col = lerp3(night, day, day_factor)
    return col, saturate(atmo_factor)
