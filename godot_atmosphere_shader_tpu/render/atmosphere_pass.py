"""Whole-frame atmosphere pass: the ``atmosphere_fragment`` analog.

Reference: ``/root/reference/addons/zylann.atmosphere/shaders/include/planet_atmosphere_main.gdshaderinc:106-197``.
Per pixel: reconstruct linear depth from the depth buffer, build the view
ray, intersect the atmosphere shell, clamp against depth (with the optional
``u_sphere_depth_factor`` simplified-sphere blend), fetch blue-noise jitter,
dispatch to the v1/v2 integrator, then optionally run the cloud pass.  The
GLSL ``discard`` on a shell miss becomes a returned mask the compositor uses.

The reference evaluates in view space with ``ray_origin = 0``; we evaluate in
world space (identical geometry — all of the math is distance/direction
based), which makes multi-planet scenes a simple loop.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.params import AtmosphereParams, VariantConfig
from ..ops.atmosphere_v1 import compute_atmosphere_v1
from ..ops.atmosphere_v2 import compute_atmosphere_v2
from ..ops.clouds import render_clouds
from ..ops.noise import sample_noise3
from ..ops.sampling import (extend_cubemap_borders, sample_cubemap_bilinear,
                            sample_cubemap_seamless, sample_trilinear_repeat)
from ..utils.camera import Camera, rigid_inverse, world_ray_dirs
from ..utils.vecmath import Vec3, lerp, normalize, ray_sphere
from .jitter import jitter_plane


def make_shape_fn(config: VariantConfig, params: AtmosphereParams):
    """Cloud shape field: procedural noise (fast path) or trilinear texture.

    Input coords are the reference's 3D texture coordinates
    (``cloud_funcs.gdshaderinc:49``: model-space pos × ``u_cloud_shape_scale``,
    one texture period per unit).
    """
    if config.cloud_shape_noise is not None:
        spec = config.cloud_shape_noise
        sx, sy, sz = spec.scale

        def shape_fn(p: Vec3):
            return 0.5 + 0.5 * sample_noise3(spec.noise, p.x * sx, p.y * sy, p.z * sz)

        return shape_fn

    tex = params.cloud_shape_texture
    if tex is None:
        raise ValueError("clouds need cloud_shape_texture or a procedural spec")

    def shape_fn(p: Vec3):
        return sample_trilinear_repeat(tex, p.x, p.y, p.z)

    return shape_fn


def make_coverage_fn(config: VariantConfig, params: AtmosphereParams):
    """Cloud coverage field: cubemap sample or its procedural equivalent.

    ``texture(samplerCube, p)`` only uses the *direction* of ``p``; the
    procedural path therefore evaluates the NoiseCubemap generator formula
    ``0.5 + 0.5·noise(normalize(p)·scale)`` (``noise_cubemap.gd:130``)
    directly — no bake, no seams, no face filtering error.
    """
    if config.cloud_coverage_noise is not None:
        spec = config.cloud_coverage_noise
        sx, sy, sz = spec.scale

        def coverage_fn(p: Vec3):
            d = normalize(p)
            return 0.5 + 0.5 * sample_noise3(spec.noise, d.x * sx, d.y * sy, d.z * sz)

        return coverage_fn

    faces = params.cloud_coverage_cubemap
    if faces is None:
        raise ValueError("clouds need cloud_coverage_cubemap or a procedural spec")

    if config.cubemap_seamless:
        # GL samplerCube blends across face seams (PARITY #10); extend once
        # per frame (traced, tiny: 6·(res+2)² resamples) and sample the
        # border-extended stack.  Interior = per-face clamp to 1 ulp.
        faces_ext = extend_cubemap_borders(faces)

        def coverage_fn(p: Vec3):
            return sample_cubemap_seamless(faces_ext, p)
    else:
        def coverage_fn(p: Vec3):
            return sample_cubemap_bilinear(faces, p)

    return coverage_fn


def shade_atmosphere(params: AtmosphereParams, config: VariantConfig,
                     ray_origin: Vec3, ray_dir: Vec3,
                     linear_depth: jnp.ndarray, jitter: jnp.ndarray,
                     planet_center: Vec3, normalize_layout=None,
                     shape_fn=None, coverage_fn=None, knot_store=None,
                     ) -> Tuple[Vec3, jnp.ndarray, jnp.ndarray]:
    """The pure elementwise shading core — shared verbatim by the XLA path
    and the Pallas megakernel (same jnp ops, bit-identical math).

    Everything from the shell intersection at
    ``planet_atmosphere_main.gdshaderinc:144`` onward.
    """
    atmosphere_radius = params.planet_radius + params.atmosphere_height
    rs0, rs1 = ray_sphere(planet_center, atmosphere_radius, ray_origin, ray_dir)
    hit = rs0 != rs1

    t_begin = jnp.maximum(rs0, 0.0)
    t_end = jnp.maximum(rs1, 0.0)
    # keep masked lanes finite: a zero-length march at the camera
    t_begin = jnp.where(hit, t_begin, 0.0)
    t_end = jnp.where(hit, t_end, 0.0)

    g0, g1 = ray_sphere(planet_center, params.planet_radius, ray_origin, ray_dir)
    gd = jnp.where(g0 != g1, g0, 1e7)
    linear_depth = lerp(linear_depth, gd, params.sphere_depth_factor)
    t_end = jnp.minimum(t_end, linear_depth)
    t_end = jnp.maximum(t_end, t_begin)

    sun_pos = Vec3(params.sun_position[0], params.sun_position[1],
                   params.sun_position[2])
    sun_dir = normalize(sun_pos - planet_center)

    def shade():
        if config.model == "v1":
            rgb, alpha = compute_atmosphere_v1(
                ray_origin, ray_dir, planet_center, t_begin, t_end, sun_dir,
                params, config.atmosphere_steps, unroll=config.march_unroll)
        else:
            rgb, alpha = compute_atmosphere_v2(
                ray_origin, ray_dir, planet_center, t_begin, t_end, sun_dir,
                jitter, params, config.atmosphere_steps,
                od_mode=config.od_mode, lut=params.optical_depth_lut,
                unroll=config.march_unroll)

        if config.clouds_enabled:
            # the megakernel overrides the field closures with in-kernel
            # texture samplers (texture mode); default = build from config
            sfn = shape_fn or make_shape_fn(config, params)
            cfn = coverage_fn or make_coverage_fn(config, params)
            # knot grouping only pays (and only changes results) for the
            # in-kernel texture samplers
            kgroup = (config.texture_knot_group
                      if (shape_fn is not None or coverage_fn is not None)
                      else 1)
            if config.cloud_lod > 1:
                from ..ops.clouds import render_clouds_lod

                rgb, alpha = render_clouds_lod(
                    rgb, alpha, planet_center, ray_origin, ray_dir,
                    linear_depth, params.world_to_model, sun_dir, jitter,
                    params.time, params, sfn, cfn,
                    config.cloud_steps, config.raymarched_lighting,
                    config.clouds_always_low_quality, config.cloud_lod,
                    coverage_interp=config.cloud_coverage_interp,
                    cull=config.tile_cull,
                    coverage_knots=config.cloud_coverage_knots,
                    coverage_lod=config.cloud_coverage_lod,
                    normalize_layout=normalize_layout,
                    shape_interp=config.cloud_shape_interp,
                    shape_knots=config.cloud_shape_knots,
                    knot_group=kgroup, knot_store=knot_store,
                    unroll=config.march_unroll,
                    knot_dynamic=config.knot_dynamic)
            else:
                rgb, alpha = render_clouds(
                    rgb, alpha, planet_center, ray_origin, ray_dir,
                    linear_depth, params.world_to_model, sun_dir, jitter,
                    params.time, params, sfn, cfn,
                    config.cloud_steps, config.raymarched_lighting,
                    config.clouds_always_low_quality,
                    coverage_interp=config.cloud_coverage_interp,
                    cull=config.tile_cull,
                    coverage_knots=config.cloud_coverage_knots,
                    coverage_lod=config.cloud_coverage_lod,
                    normalize_layout=normalize_layout,
                    shape_interp=config.cloud_shape_interp,
                    shape_knots=config.cloud_shape_knots,
                    knot_group=kgroup, knot_store=knot_store,
                    unroll=config.march_unroll,
                    knot_dynamic=config.knot_dynamic)
        return rgb.x, rgb.y, rgb.z, alpha

    if config.tile_cull:
        # Scalar-predicate cond: under jit over the whole frame this is one
        # near-always-true branch, but inside the Pallas megakernel each
        # framebuffer tile gets its own instance — tiles whose rays all miss
        # the shell skip the integrators entirely.  That recovers the perf
        # the reference buys with its far cube mesh + discard
        # (planet_atmosphere.gd:261-282, SURVEY.md §7 hard part (b)).
        zero = jnp.zeros_like(t_begin)
        rx, ry, rz, alpha = jax.lax.cond(
            jnp.any(hit), shade, lambda: (zero, zero, zero, zero))
    else:
        rx, ry, rz, alpha = shade()

    return Vec3(rx, ry, rz), alpha, hit


def atmosphere_pass(params: AtmosphereParams, config: VariantConfig,
                    camera: Camera, height: int, width: int,
                    depth: Optional[jnp.ndarray] = None,
                    jitter: Optional[jnp.ndarray] = None,
                    ray_dir: Optional[Vec3] = None,
                    linear_depth: Optional[jnp.ndarray] = None,
                    ) -> Tuple[Vec3, jnp.ndarray, jnp.ndarray]:
    """Render one atmosphere layer.  Returns ``(rgb, alpha, hit_mask)``.

    ``depth`` is a nonlinear depth buffer in the configured convention
    (reverse-Z by default); ``linear_depth`` may be supplied directly to skip
    reconstruction (e.g. from the analytic opaque pass).
    """
    from ..utils.camera import linear_depth_from_buffer

    if ray_dir is None:
        ray_dir = world_ray_dirs(camera, height, width)
    ray_origin = camera.position

    if linear_depth is None:
        if depth is not None:
            linear_depth = linear_depth_from_buffer(
                camera, depth, height, width, reverse_z=config.reverse_z)
        else:
            linear_depth = jnp.full((height, width), 1e7, jnp.float32)

    if jitter is None:
        jitter = jitter_plane(height, width)

    model_to_world = rigid_inverse(params.world_to_model)
    pc = model_to_world[:3, 3]
    planet_center = Vec3(pc[0], pc[1], pc[2])

    return shade_atmosphere(params, config, ray_origin, ray_dir,
                            linear_depth, jitter, planet_center)


def composite_over(background: Vec3, rgb: Vec3, alpha, mask) -> Vec3:
    """Blend the unshaded transparent atmosphere surface over the frame.

    Missed-shell pixels ``discard`` (``planet_atmosphere_main.gdshaderinc:191-196``),
    leaving the background untouched.
    """
    a = jnp.where(mask, alpha, 0.0)
    return Vec3(
        background.x * (1.0 - a) + rgb.x * a,
        background.y * (1.0 - a) + rgb.y * a,
        background.z * (1.0 - a) + rgb.z * a,
    )
