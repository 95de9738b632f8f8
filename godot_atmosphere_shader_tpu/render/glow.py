"""HDR glow (bloom) output stage — the demo environment's post-process.

The reference relies on Godot's Environment glow
(``demo/planet_atmosphere_test.tscn`` Environment block: ``glow_enabled``,
``glow_levels/4 = glow_levels/6 = 1.0``, ``glow_intensity = 4.0``,
``glow_strength = 0.8``, additive blend, ``glow_hdr_scale = 1.0``) to put a
bloom around the HDR sun sphere (albedo (4, 4, 4), unshaded) — SURVEY.md
§2.2 lists it among the engine facilities to replace in our compositor.

This is a faithful *structure* match, not a bit match (Godot's chain lives
in private engine compute shaders): luminance-soft-thresholded bright pass
→ 2× mip chain with a separable 3-tap blur per level → weighted per-level
accumulation (``glow_levels``) with ``glow_strength`` blending successive
upsamples, additively composited scaled by ``glow_intensity``.  Everything
is plain XLA: at one pass per frame over the framebuffer the stage is
bandwidth-trivial next to the raymarch, and XLA fuses the pyramid fine.

Default tonemap after compositing is Godot's ``TONE_MAPPER_LINEAR``
(clamp), matching the demo env which sets no tonemapper.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GlowSettings:
    """Environment glow parameters (hashable: rides jit as a static arg).

    ``levels``: weights of blur mips 1..7 (Godot's ``glow_levels/1..7``;
    index 0 here = mip level 1 = half resolution).
    """

    enabled: bool = True
    levels: Tuple[float, ...] = (0.0, 0.0, 0.0, 1.0, 0.0, 1.0, 0.0)
    intensity: float = 0.8
    strength: float = 1.04
    hdr_threshold: float = 1.0
    hdr_scale: float = 2.0
    bloom: float = 0.0

    @staticmethod
    def demo() -> "GlowSettings":
        """The demo scene's Environment block values
        (``planet_atmosphere_test.tscn:26-35``)."""
        return GlowSettings(levels=(0.0, 0.0, 0.0, 1.0, 0.0, 1.0, 0.0),
                            intensity=4.0, strength=0.8, hdr_scale=1.0)


def _blur3(x):
    """Separable 3-tap [1, 2, 1]/4 blur with edge clamp."""
    k = (0.25, 0.5, 0.25)

    def axis_blur(a, ax):
        n = a.shape[ax]
        p = jnp.pad(a, [(1, 1) if i == ax else (0, 0)
                        for i in range(a.ndim)], mode="edge")
        lo = jax.lax.slice_in_dim(p, 0, n, axis=ax)
        hi = jax.lax.slice_in_dim(p, 2, n + 2, axis=ax)
        return k[0] * lo + k[1] * a + k[2] * hi

    return axis_blur(axis_blur(x, 0), 1)


def _down2(x):
    h, w, c = x.shape
    return x[: h - h % 2, : w - w % 2].reshape(
        h // 2, 2, w // 2, 2, c).mean(axis=(1, 3))


def _up2(x, h, w):
    """Bilinear 2× upsample to exactly (h, w)."""
    return jax.image.resize(x, (h, w, x.shape[2]), method="bilinear")


@functools.partial(jax.jit, static_argnames=("settings",))
def apply_glow(img: jnp.ndarray, settings: GlowSettings) -> jnp.ndarray:
    """Composite the glow chain over a linear HDR frame (H, W, 3).

    Returns the still-linear frame (tonemap/encode happens at the output
    boundary, ``utils/color.py``).
    """
    if not settings.enabled:
        return img
    img = jnp.asarray(img, jnp.float32)
    h, w, _ = img.shape

    # bright pass: luminance soft-knee threshold (glow_bloom lifts the
    # floor so even sub-threshold pixels contribute when bloom > 0)
    lum = jnp.max(img, axis=-1, keepdims=True)
    over = jnp.maximum(lum - settings.hdr_threshold, 0.0) * settings.hdr_scale
    wgt = over / jnp.maximum(lum, 1e-4)
    wgt = wgt + settings.bloom * (1.0 - wgt)
    bright = img * wgt

    # mip chain: downsample + blur per level (glow_strength sets the blur
    # amount per level, like the engine's per-level gaussian strength),
    # then a weight-normalized sum of the upsampled levels
    n = len(settings.levels)
    reps = max(1, int(round(2.0 * settings.strength)))
    total_w = sum(settings.levels)
    if total_w <= 0.0:
        return img
    cur = _blur3(bright)
    glow = None
    for lvl in range(n):
        if min(cur.shape[0], cur.shape[1]) < 2:
            break
        cur = _down2(cur)
        for _ in range(reps):
            cur = _blur3(cur)
        wl = settings.levels[lvl]
        if wl:
            u = wl * _up2(cur, h, w)
            glow = u if glow is None else glow + u
    if glow is None:
        return img
    # additive blend (glow_blend_mode = 0 in the demo env); the 0.25
    # composite scale calibrates the demo settings (intensity 4.0,
    # levels 4+6) to a sun halo of a few disc radii at 1080p-scale frames
    # rather than a frame-filling wash — a documented approximation of the
    # engine's tonemap-stage glow normalization
    return img + (0.25 * settings.intensity / total_w) * glow
