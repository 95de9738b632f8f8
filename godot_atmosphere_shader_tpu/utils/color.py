"""Color management.

Godot converts ``source_color`` uniforms from sRGB to linear before they reach
the shader (e.g. ``u_atmosphere_modulate`` in
``/root/reference/addons/zylann.atmosphere/shaders/include/atmosphere_funcs_v2.gdshaderinc:10-11``).
Our scene API does the same conversion at the boundary; everything inside the
renderer is linear.  A filmic-ish tonemap + linear→sRGB encode is provided for
display output parity with the demo's HDR environment.
"""

from __future__ import annotations

import jax.numpy as jnp


def srgb_to_linear(c):
    c = jnp.asarray(c, dtype=jnp.float32)
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c):
    c = jnp.asarray(c, dtype=jnp.float32)
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)


def tonemap_linear(c, exposure: float = 1.0):
    """Clamp tonemap (Godot's default TONE_MAPPER_LINEAR)."""
    return jnp.clip(c * exposure, 0.0, 1.0)
