"""Far-mode LOD: screen-space row bounds of an atmosphere shell.

The reference's far mode swaps the fullscreen quad for a world-space cube
mesh so the rasterizer only shades pixels the atmosphere can touch
(``planet_atmosphere.gd:261-321``); every other pixel never runs the
fragment shader.  The megakernel's in-kernel ``tile_cull`` recovers the
integrator cost of missed tiles but still pays grid launch + ray setup +
shell intersection for every tile of every layer.  This module computes the
TPU-native equivalent of the cube mesh: the conservative row band of the
projected shell, so the scene driver can launch the layer's kernel over
only the touched rows and pass the background through elsewhere
(``megakernel.render_scene_pallas(bands=...)``).

The vertical extremes of a perspective-projected sphere lie in the plane
``x = cx`` (the Lagrange condition for extremizing ``y/(-z)`` on the sphere
forces ``px = cx``), so the bound reduces to 2D tangents from the origin to
the circle ``(cy, cz, r)`` — no conic fitting needed.

Host-side float64 numpy: the result feeds a *static* band height (grid
shapes must be known at trace time), so this runs per frame on the host,
like the reference's per-frame ``_process`` mode switch.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple, Union

import numpy as np

#: band heights are quantized to multiples of this (the megakernel block
#: height) and rounded up to limit jit re-specialization to a handful of
#: distinct band shapes per config
BAND_QUANTUM = 64
#: extra rows beyond the analytic bound: absorbs f32 ray/intersection
#: rounding at the silhouette (the analytic bound is float64-exact, the
#: kernel's ray_sphere is f32)
BAND_MARGIN_ROWS = 4

#: sentinel: the shell is entirely behind the camera — the layer can be
#: skipped outright (every ray misses)
EMPTY = "empty"


def projected_row_band(view_to_world, fov_y_rad: float, height: int,
                       center, radius: float,
                       ) -> Union[None, str, Tuple[int, int]]:
    """Conservative screen-row interval touched by a sphere.

    Returns ``None`` for "use the full frame" (camera inside the sphere,
    sphere crossing the camera plane, or band ≥ most of the frame),
    :data:`EMPTY` when the sphere is entirely behind the camera, or
    ``(row0, band_height)`` with ``row0 % 8 == 0`` and
    ``band_height % BAND_QUANTUM == 0``.
    """
    m = np.asarray(view_to_world, np.float64)
    r_mat = m[:3, :3]
    t = m[:3, 3]
    c_world = np.asarray(center, np.float64)
    c_view = r_mat.T @ (c_world - t)
    cy, cz = float(c_view[1]), float(c_view[2])
    r = float(radius)

    if cz - r >= 0.0:
        return EMPTY  # entirely behind the camera plane
    d2 = cy * cy + cz * cz
    if d2 <= r * r or cz + r >= 0.0:
        return None  # inside the (y,z) silhouette circle / straddling z=0

    d = math.sqrt(d2)
    theta_c = math.atan2(cy, -cz)  # angle from the forward (-z) axis
    alpha = math.asin(min(r / d, 1.0))
    tan_f = math.tan(0.5 * float(fov_y_rad))

    def ndc_of(theta):
        if theta >= 0.5 * math.pi:
            return float("inf")
        if theta <= -0.5 * math.pi:
            return float("-inf")
        return math.tan(theta) / tan_f

    ndc_hi = ndc_of(theta_c + alpha)  # top of the silhouette (y up)
    ndc_lo = ndc_of(theta_c - alpha)

    # ndc_y → row: row = (1 - ndc_y) / 2 * height (top row = +1)
    row_top = (1.0 - ndc_hi) * 0.5 * height
    row_bot = (1.0 - ndc_lo) * 0.5 * height
    lo = math.floor(row_top) - BAND_MARGIN_ROWS
    hi = math.ceil(row_bot) + BAND_MARGIN_ROWS
    if hi <= 0 or lo >= height:
        return EMPTY  # projects fully above/below the frame
    lo = max(lo, 0)
    hi = min(hi, height)

    # quantize: row0 down to a multiple of 8 (DMA sublane alignment for the
    # jitter slice), band height up to BAND_QUANTUM multiples
    row0 = (lo // 8) * 8
    band_h = hi - row0
    band_h = ((band_h + BAND_QUANTUM - 1) // BAND_QUANTUM) * BAND_QUANTUM
    if row0 + band_h > height:
        row0 = max(0, height - band_h)
        if row0 % 8:
            row0 = (row0 // 8) * 8
        band_h = min(((height - row0 + BAND_QUANTUM - 1) // BAND_QUANTUM)
                     * BAND_QUANTUM, height)
        if row0 + band_h > height:
            return None
    if band_h >= height - BAND_QUANTUM // 2:
        return None  # nearly fullscreen: banding buys nothing
    return int(row0), int(band_h)


def layer_band(atmo_mode: int, view_to_world, fov_y_rad: float, height: int,
               center, planet_radius: float, atmosphere_height: float,
               mode_far: int = 1):
    """Band decision for one atmosphere layer, honoring the node's near/far
    mode switch: near mode keeps the fullscreen pass exactly like the
    reference's fullscreen quad (``planet_atmosphere.gd:261-282``)."""
    if atmo_mode != mode_far:
        return None
    return projected_row_band(view_to_world, fov_y_rad, height, center,
                              planet_radius + atmosphere_height)
