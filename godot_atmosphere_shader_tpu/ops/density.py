"""Atmosphere density profile.

Reference: ``/root/reference/addons/zylann.atmosphere/shaders/include/atmosphere_common.gdshaderinc:12-24``
— a cubic falloff ``(1 - h)^3 · density`` of the normalized height ``h``,
clamped to the shell.  Note the reference *clamps* ``h`` to ``[0, 1]``, so
samples below the planet surface evaluate at full density; the optical-depth
bake integrates straight through the planet with that value (a visible
behavior we preserve).
"""

from __future__ import annotations

from ..utils.vecmath import saturate


def atmosphere_density(dist_from_center, planet_radius, atmosphere_height, density):
    """``get_atmosphere_density`` — density at a distance from planet center.

    ``density`` is the ``u_density`` uniform (default 0.2).  Both the v2
    integrator and the optical-depth bake multiply the result by ``u_density``
    *again* (``atmosphere_funcs_v2.gdshaderinc:65``, ``optical_depth.gdshader:27``),
    making the effective extinction ∝ density²; that quirk lives at the call
    sites, not here.
    """
    sd = dist_from_center - planet_radius
    h = saturate(sd / atmosphere_height)
    y = 1.0 - h
    return y * y * y * density
