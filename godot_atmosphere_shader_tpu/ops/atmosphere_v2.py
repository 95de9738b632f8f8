"""v2 scattering atmosphere: wavelength-dependent single scattering.

Reference: ``/root/reference/addons/zylann.atmosphere/shaders/include/atmosphere_funcs_v2.gdshaderinc``
(Sebastian-Lague-style).  Per step: baked sun-ray optical depth + accumulated
view-ray optical depth → per-channel transmittance → in-scatter accumulation;
alpha accumulates separately from density alone; ambient floor; blue-noise
alpha dither capped at 0.99.

Two static sun-OD modes:

* ``"lut"`` — bilinear lookups in the baked 256×256 LUT, exactly mirroring
  ``get_baked_optical_depth`` (:14-29).  Gather-bound; used for reference
  parity and small renders.
* ``"analytic"`` — closed-form/quadrature evaluation of the same integral
  (``ops/optical_depth.optical_depth_analytic``), pure VPU arithmetic; the
  production TPU path.

The 8-step loop is unrolled at trace time (step count is a compile-time
variant parameter, like the reference's ``ATMOSPHERE_RAYMARCH_STEPS`` define).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.vecmath import Vec3, pow4
from .density import atmosphere_density
from .optical_depth import get_baked_optical_depth, optical_depth_analytic


def scattering_coefficients(params):
    """``pow4(400/λ) · strength`` per channel (:47-51)."""
    w = params.scattering_wavelengths
    s = params.scattering_strength
    return (pow4(400.0 / w[0]) * s,
            pow4(400.0 / w[1]) * s,
            pow4(400.0 / w[2]) * s)


def compute_atmosphere_v2(ray_origin: Vec3, ray_dir: Vec3, planet_center: Vec3,
                          t_begin, t_end, sun_dir: Vec3, jitter,
                          params, steps: int, od_mode: str = "analytic",
                          lut=None, unroll: bool = False):
    """``compute_atmosphere_v2`` (:32-101).  Returns ``(rgb: Vec3, alpha)``.

    ``params`` needs: ``planet_radius``, ``atmosphere_height``, ``density``,
    ``scattering_strength``, ``scattering_wavelengths`` (3,),
    ``atmosphere_modulate`` and ``atmosphere_ambient_color`` (linear (3,)).
    """
    r = params.planet_radius
    h = params.atmosphere_height
    dens_param = params.density
    cr, cg, cb = scattering_coefficients(params)

    if od_mode == "lut" and lut is None:
        raise ValueError("od_mode='lut' requires a baked LUT")
    if od_mode not in ("lut", "analytic"):
        raise ValueError(f"unknown od_mode {od_mode!r}")

    step_len = (t_end - t_begin) / float(steps)
    pos0 = ray_origin + ray_dir * t_begin
    zero = jnp.zeros_like(t_begin)

    def body(_, carry):
        px, py, pz, total_r, total_g, total_b, view_od, alpha = carry
        pos = Vec3(px, py, pz)
        if od_mode == "lut":
            sun_od = get_baked_optical_depth(pos, sun_dir, planet_center, lut, r, h)
        else:
            sun_od = optical_depth_analytic(pos, sun_dir, planet_center, r, h, dens_param)

        rel = pos - planet_center
        height = jnp.sqrt(rel.x * rel.x + rel.y * rel.y + rel.z * rel.z)
        # note the second ·density — extinction ∝ density² as in the reference
        local_density = atmosphere_density(height, r, h, dens_param) * dens_param
        view_od = view_od + local_density * step_len

        od = sun_od + view_od
        total_r = total_r + local_density * step_len * jnp.exp(-od * cr) * cr
        total_g = total_g + local_density * step_len * jnp.exp(-od * cg) * cg
        total_b = total_b + local_density * step_len * jnp.exp(-od * cb) * cb

        vtransmittance = jnp.exp(-local_density * step_len)
        alpha = alpha + (1.0 - vtransmittance) * (1.0 - alpha)

        pos = pos + ray_dir * step_len
        return pos.x, pos.y, pos.z, total_r, total_g, total_b, view_od, alpha

    # fori_loop traces the (quadrature-heavy) body once; step counts are
    # static per variant so this is a counted loop, XLA-friendly.  ``unroll``
    # is for cost analysis only: XLA's cost model counts a while body once,
    # not ×trip-count, so exact per-step accounting needs an unrolled trace.
    carry = (pos0.x, pos0.y, pos0.z, zero, zero, zero, zero, zero)
    carry = jax.lax.fori_loop(0, steps, body, carry, unroll=bool(unroll))
    _, _, _, total_r, total_g, total_b, _, alpha = carry

    amb = params.atmosphere_ambient_color
    total_r = jnp.clip(total_r + amb[0], 0.0, 1.0)
    total_g = jnp.clip(total_g + amb[1], 0.0, 1.0)
    total_b = jnp.clip(total_b + amb[2], 0.0, 1.0)

    # de-banding dither; 0.99 cap avoids noisy HDR sunsets (:93-96)
    alpha = jnp.clip(alpha + jitter * 0.02, 0.0, 0.99)

    mod = params.atmosphere_modulate
    return Vec3(total_r * mod[0], total_g * mod[1], total_b * mod[2]), alpha
