"""Blue-noise screen-space jitter.

The reference fetches ``blue_noise.png`` with
``texelFetch(ivec2(viewport_size * screen_uv) & 0xff)``
(``planet_atmosphere_main.gdshaderinc:166-169``).  On TPU a per-pixel dynamic
fetch would be a gather, but the access pattern is a *static* 256-periodic
tiling of the screen — so we materialize the full-frame jitter plane once per
framebuffer size with a cheap tile/slice (no gathers), and pass it to kernels
as an ordinary input plane.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax.numpy as jnp

_ASSET = os.path.join(os.path.dirname(__file__), "..", "assets", "blue_noise_256.npy")


@functools.lru_cache(maxsize=1)
def blue_noise_256() -> np.ndarray:
    """The committed 256×256 blue-noise asset (values in [0, 1))."""
    path = os.path.abspath(_ASSET)
    if os.path.exists(path):
        return np.load(path)
    # fallback: deterministic white noise (tests still run; visuals degrade)
    rng = np.random.default_rng(0)
    return rng.random((256, 256), dtype=np.float32)


def jitter_plane(height: int, width: int) -> jnp.ndarray:
    """Full-frame jitter: the blue-noise texture tiled across the framebuffer."""
    tile = jnp.asarray(blue_noise_256())
    reps_y = -(-height // 256)
    reps_x = -(-width // 256)
    return jnp.tile(tile, (reps_y, reps_x))[:height, :width]
