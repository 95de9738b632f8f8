"""Top-level frame renderer: ``render(scene, camera, config) → frame``.

One pure jitted function per (variant config, resolution): the analog of the
reference's per-frame flow (``SURVEY.md §3.2``) — opaque pass, then each
atmosphere drawn back-to-front as an unshaded transparent layer composited
with depth awareness, exactly like Godot's transparent-pass sorting of
``PlanetAtmosphere`` meshes (``README.md:11``).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.params import AtmosphereParams, VariantConfig
from ..utils.camera import Camera
from ..utils.vecmath import Vec3
from .atmosphere_pass import atmosphere_pass, composite_over
from .jitter import jitter_plane
from .opaque import OpaqueScene, render_opaque


def shared_reverse_z(configs) -> bool:
    """The depth-buffer convention for the (single) opaque pass.

    Godot's REVERSE_Z is an engine-global property, not per-material
    (``planet_atmosphere_main.gdshaderinc:30-33`` keys it off the engine
    version); layers disagreeing would silently mis-composite against the
    one shared depth buffer, so it is an error here.
    """
    if not configs:
        return True
    rz = configs[0].reverse_z
    if any(c.reverse_z != rz for c in configs):
        raise ValueError("all atmosphere layers must share one reverse_z "
                         "depth convention (it is engine-global in Godot)")
    return rz


def render_frame_impl(atmospheres: Sequence[AtmosphereParams],
                      configs: Tuple[VariantConfig, ...],
                      camera: Camera,
                      opaque: Optional[OpaqueScene],
                      height: int, width: int) -> dict:
    """Trace one frame.  ``atmospheres`` are pre-sorted far→near."""
    reverse_z = shared_reverse_z(configs)
    if opaque is not None:
        bg, depth, linear_depth = render_opaque(opaque, camera, height, width,
                                                reverse_z=reverse_z)
    else:
        bg = Vec3(*(jnp.zeros((height, width), jnp.float32) for _ in range(3)))
        depth = None
        linear_depth = jnp.full((height, width), 1e7, jnp.float32)

    jitter = jitter_plane(height, width)
    resolved = [p.resolve_frame_state() for p in atmospheres]
    if any(c.temporal_jitter for c in configs):
        # same golden-ratio time offset as the megakernel's temporal_jitter
        # (megakernel.py) so the two paths stay comparable under TAA
        toff = resolved[0].time * 38.196601125
        jitter = jitter + (toff - jnp.floor(toff))
        jitter = jitter - jnp.floor(jitter)

    color = bg
    alpha_out = jnp.zeros((height, width), jnp.float32)
    for params, config in zip(resolved, configs):
        rgb, alpha, mask = atmosphere_pass(
            params, config, camera, height, width,
            jitter=jitter, linear_depth=linear_depth)
        color = composite_over(color, rgb, alpha, mask)
        alpha_out = jnp.maximum(alpha_out, jnp.where(mask, alpha, 0.0))

    image = jnp.stack([color.x, color.y, color.z], axis=-1)
    out = {"color": image, "alpha": alpha_out}
    if depth is not None:
        out["depth"] = depth
    return out


@functools.partial(jax.jit, static_argnames=("configs", "height", "width"))
def _render_jit(atmospheres, configs, camera, opaque, height, width):
    return render_frame_impl(atmospheres, configs, camera, opaque, height, width)


def render_frame(atmospheres, configs, camera, opaque, height: int, width: int):
    """Jitted frame render.

    ``atmospheres``: tuple of :class:`AtmosphereParams` (far→near);
    ``configs``: matching tuple of :class:`VariantConfig` (static — each
    distinct combination compiles once, like the reference's shader variants).
    """
    if isinstance(atmospheres, AtmosphereParams):
        atmospheres = (atmospheres,)
    if isinstance(configs, VariantConfig):
        configs = (configs,)
    return _render_jit(tuple(atmospheres), tuple(configs), camera, opaque,
                       height, width)


@functools.partial(jax.jit, static_argnames=("configs", "height", "width"))
def _render_flight_jit(atmospheres, fs_stacks, cam_stack, camera, opaque,
                       configs, height, width):
    import dataclasses

    def one_frame(per_frame):
        fss, vtw = per_frame
        ps = tuple(dataclasses.replace(p, frame_state=fs)
                   for p, fs in zip(atmospheres, fss))
        cam = dataclasses.replace(camera, view_to_world=vtw)
        out = render_frame_impl(ps, configs, cam, opaque, height, width)
        return out["color"], out["alpha"]

    colors, alphas = jax.lax.map(one_frame, (fs_stacks, cam_stack))
    return {"color": colors, "alpha": alphas}


def render_flight_xla(atmospheres, fs_stacks, configs, camera, opaque,
                      height: int, width: int, cam_stack=None) -> dict:
    """K frames in one dispatch via an in-graph ``lax.map`` (the XLA-path
    twin of ``megakernel.render_flight_pallas``; see Scene.render_flight)."""
    if cam_stack is None:
        k = int(fs_stacks[0].shape[0])
        cam_stack = jnp.broadcast_to(camera.view_to_world, (k, 4, 4))
    return _render_flight_jit(tuple(atmospheres), tuple(fs_stacks),
                              jnp.asarray(cam_stack, jnp.float32), camera,
                              opaque, tuple(configs), height, width)
