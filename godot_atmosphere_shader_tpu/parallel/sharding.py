"""Multi-chip rendering: pure data parallelism over framebuffer rows.

The algorithm has zero cross-pixel communication — every pixel's scattering
integral is independent (``SURVEY.md §2.3``) — so the idiomatic TPU scaling
is a 1-D device mesh with the framebuffer row-sharded via ``shard_map``.
Small state (params pytree, camera) is replicated; the only ICI traffic is
the initial broadcast and the output gather, both handled by the runtime's
sharding machinery.  A sharded render bit-matches the single-chip render on
the same scene, which the multi-chip tests assert exactly.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax ≥ 0.8 promotes shard_map out of experimental
    from jax import shard_map as _shard_map_raw
    _REP_KWARG = "check_vma"
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_raw
    _REP_KWARG = "check_rep"


def shard_map(f, mesh, in_specs, out_specs):
    """Version-compat wrapper: disable replication checking (our bodies use
    scalar collectives-free math; the checker rejects the pallas_call)."""
    return _shard_map_raw(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, **{_REP_KWARG: False})

from ..models.params import AtmosphereParams, VariantConfig
from ..render.atmosphere_pass import atmosphere_pass, composite_over
from ..render.jitter import jitter_plane
from ..render.opaque import OpaqueScene, render_opaque
from ..utils.camera import Camera, world_ray_dirs
from ..utils.vecmath import Vec3


def make_mesh(devices=None, axis_name: str = "rows") -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def _check_lod_alignment(configs, h_local: int):
    """Cloud LOD groups rows in fixed vertical blocks; a shard boundary that
    falls inside a group would make the sharded render pair different rows
    than the single-chip render (a subpixel cloud shift per band).  Keep the
    'sharded bit-matches single-chip' guarantee by requiring alignment."""
    for c in configs:
        if not getattr(c, "clouds_enabled", False):
            continue
        align = c.cloud_lod * (c.cloud_coverage_lod
                               if c.cloud_coverage_interp else 1)
        if align > 1 and h_local % align:
            raise ValueError(
                f"rows per shard ({h_local}) must be a multiple of the "
                f"cloud LOD group ({align}) — pad the frame height or "
                f"change the mesh size")


def _shade_slice(atmospheres, configs, camera, opaque,
                 ray_dir_x, ray_dir_y, ray_dir_z, jitter):
    """Per-device body: shade a row-slice of the framebuffer."""
    ray_dir = Vec3(ray_dir_x, ray_dir_y, ray_dir_z)
    h, w = ray_dir_x.shape
    from ..render.renderer import shared_reverse_z

    reverse_z = shared_reverse_z(configs)

    if opaque is not None:
        bg, depth, linear_depth = render_opaque(
            opaque, camera, h, w, reverse_z=reverse_z, ray_dir=ray_dir)
    else:
        bg = Vec3(*(jnp.zeros((h, w), jnp.float32) for _ in range(3)))
        depth = jnp.zeros((h, w), jnp.float32)
        linear_depth = jnp.full((h, w), 1e7, jnp.float32)

    color = bg
    for params, config in zip(atmospheres, configs):
        params = params.resolve_frame_state()
        rgb, alpha, mask = atmosphere_pass(
            params, config, camera, h, w,
            jitter=jitter, ray_dir=ray_dir, linear_depth=linear_depth)
        color = composite_over(color, rgb, alpha, mask)

    return jnp.stack([color.x, color.y, color.z], axis=-1)


def render_frame_pallas_sharded(params: AtmosphereParams,
                                config: VariantConfig,
                                camera: Camera,
                                opaque: Optional[OpaqueScene],
                                height: int, width: int,
                                mesh: Mesh,
                                block: Tuple[int, int] = (32, 128),
                                interpret: bool = False,
                                tex_data=None) -> jnp.ndarray:
    """Row-shard the framebuffer over ``mesh`` with the fused Pallas
    megakernel running per shard — the production multi-chip path.
    ``tex_data`` (texture-mode pyramids) is closed over, i.e. replicated to
    every shard — the same zero-traffic broadcast as the params.

    The megakernel generates rays from global pixel indices, so each shard
    renders its own row range by offsetting the camera's NDC window: we
    simply run the kernel on the full-height grid locally... instead, each
    device renders ``height/n`` rows by passing a per-shard row offset
    through the scalar block.  Implemented by rendering the full frame in
    row bands: shard i computes rows [i·h_local, (i+1)·h_local).

    Zero cross-chip communication — identical to the XLA sharded path.
    """
    from ..ops.pallas.megakernel import render_band_pallas

    axis = mesh.axis_names[0]
    n = mesh.devices.size
    if height % n != 0:
        raise ValueError(f"height {height} not divisible by mesh size {n}")
    h_local = height // n
    _check_lod_alignment((config,), h_local)

    def shard_body(_token):
        idx = jax.lax.axis_index(axis)
        out = render_band_pallas(params, config, camera, opaque, height,
                                 width, idx * h_local, h_local, block,
                                 interpret=interpret, tex_data=tex_data)
        return out["color"]

    body = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=P(axis, None, None),
    )
    token = jnp.zeros((n,), jnp.float32)
    return jax.jit(body)(token)


def render_frame_sharded(atmospheres: Tuple[AtmosphereParams, ...],
                         configs: Tuple[VariantConfig, ...],
                         camera: Camera,
                         opaque: Optional[OpaqueScene],
                         height: int, width: int,
                         mesh: Mesh) -> jnp.ndarray:
    """Render one frame with the framebuffer row-sharded over ``mesh``.

    ``height`` must divide evenly by the mesh size (pad at the caller
    otherwise).  Returns the full ``(H, W, 3)`` image (sharded device output;
    converting to numpy gathers it).
    """
    if isinstance(atmospheres, AtmosphereParams):
        atmospheres = (atmospheres,)
    if isinstance(configs, VariantConfig):
        configs = (configs,)
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    if height % n != 0:
        raise ValueError(f"height {height} not divisible by mesh size {n}")
    _check_lod_alignment(configs, height // n)

    row_sharded = P(axis, None)
    replicated = P()

    @functools.partial(jax.jit, static_argnames=("cfgs",))
    def go(atmos, cfgs, cam, opq):
        ray_dir = world_ray_dirs(cam, height, width)
        jitter = jitter_plane(height, width)

        body = shard_map(
            lambda a, c, o, rx, ry, rz, j: _shade_slice(a, cfgs, c, o, rx, ry, rz, j),
            mesh=mesh,
            in_specs=(replicated, replicated, replicated,
                      row_sharded, row_sharded, row_sharded, row_sharded),
            out_specs=P(axis, None, None),
        )
        return body(atmos, cam, opq, ray_dir.x, ray_dir.y, ray_dir.z, jitter)

    return go(tuple(atmospheres), tuple(configs), camera, opaque)
