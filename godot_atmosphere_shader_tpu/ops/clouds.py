"""Volumetric cloud layer between two spheres.

Reference: ``/root/reference/addons/zylann.atmosphere/shaders/include/cloud_funcs.gdshaderinc``.
Coverage (cubemap) + 3D shape noise + a parabolic height curve give density;
lighting is either cheap (height ratio + sun glow) or a 6-step sun march;
a planet-shadow smoothstep dims the night side; the result mixes alpha and
additive blending over the atmosphere.

Divergence handling: the reference's per-pixel ``if``s (occlusion early-outs
at ``:265-278``, the ``alpha0 < 0.3`` density-quality switch at ``:130-136``)
become branch-free masks — TPU lanes can't diverge.  The march itself always
runs its static step count; lanes that shouldn't march contribute zero via a
degenerate ``[t, t]`` interval.  Tile-level culling in the Pallas path
recovers the early-out perf (``SURVEY.md §7 hard parts (b)``).

Field abstraction: ``shape_fn(pos) → [0,1]`` and ``coverage_fn(pos) → [0,1]``
are closures built by the renderer — either baked-texture sampling (reference
parity) or procedural noise recomputation (the gather-free TPU fast path).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

from ..utils.vecmath import (Vec3, dot, length, lerp, pow2, ray_sphere,
                             saturate, smoothstep, blend_colors)


@dataclasses.dataclass
class CloudSettings:
    """``CloudSettings`` struct (:18-23); values are traced scalars."""

    bottom_height: jnp.ndarray  # absolute radius of layer bottom
    top_height: jnp.ndarray  # absolute radius of layer top
    density_scale: jnp.ndarray
    ground_height: jnp.ndarray  # planet radius


def height_curve(x):
    """Parabolic vertical profile (:25-29)."""
    return 1.0 - pow2(2.0 * x - 1.0)


def raw_coverage(pos: Vec3, params, coverage_fn: Callable):
    """Coverage field value at a model-space position: the animated xz
    rotation (:43-45) followed by the cubemap/procedural lookup."""
    rot = params.cloud_coverage_rotation
    cov_x = rot[0, 0] * pos.x + rot[0, 1] * pos.z
    cov_z = rot[1, 0] * pos.x + rot[1, 1] * pos.z
    return coverage_fn(Vec3(cov_x, pos.y, cov_z))


def get_density_full(pos: Vec3, time, settings: CloudSettings, params,
                     shape_fn: Callable, coverage_fn: Callable,
                     low: bool, always_low: bool, coverage_value=None,
                     pos_len=None, shape_value=None, detail_value=None):
    """``get_density_full`` (:31-68).  ``pos`` is in planet model space.

    ``coverage_value`` lets the marcher supply a precomputed raw coverage
    (the ray-interpolation fast path) instead of sampling the field here;
    ``pos_len`` a precomputed ``length(pos)`` (shared with the lighting).
    ``shape_value``/``detail_value`` are the same trade for the raw shape
    and detail fields (texture mode interpolates them from ray knots).
    """
    if always_low:  # CLOUDS_ALWAYS_LOW_QUALITY (planet_atmosphere_main.gdshaderinc:49)
        low = True

    if pos_len is None:
        pos_len = length(pos)
    h = pos_len - settings.bottom_height
    height_ratio = h / (settings.top_height - settings.bottom_height)
    hc = jnp.maximum(height_curve(height_ratio), 0.0)

    coverage = (coverage_value if coverage_value is not None
                else raw_coverage(pos, params, coverage_fn))
    coverage = coverage - 0.25 * height_ratio + params.cloud_coverage_bias

    shape_raw = (shape_value if shape_value is not None
                 else shape_fn(pos * params.cloud_shape_scale))
    shape = lerp(0.5, shape_raw, params.cloud_shape_factor)

    if low:
        detail = 0.5
    elif detail_value is not None:
        detail = detail_value
    else:
        detail = shape_fn(pos * 15.0 + Vec3(time * 0.01, time * 0.01, time * 0.01))

    # u_cloud_shape_invert is a float switch in the shader (:57-59)
    shape = jnp.where(params.cloud_shape_invert == 1.0, 1.0 - shape, shape)

    density = (shape - 0.2 * detail + lerp(-1.2, 1.5, coverage)) * hc
    density = density * 50.0 - 20.0
    return saturate(density)


def get_planet_shadow(pos: Vec3, sun_dir: Vec3, pos_len=None):
    """Night-side dimming (:78-90); only direction matters."""
    if pos_len is None:
        pos_len = length(pos)
    inv = 1.0 / pos_len
    d = -(pos.x * sun_dir.x + pos.y * sun_dir.y + pos.z * sun_dir.z) * inv
    return smoothstep(-0.3, 0.3, d)


def get_light_cheap(pos: Vec3, ray_dir: Vec3, sun_dir: Vec3, alpha,
                    settings: CloudSettings, pos_len=None):
    """(:92-102) — height-ratio ambient + a pow16 sun glow through thin cloud."""
    if pos_len is None:
        pos_len = length(pos)
    h = pos_len - settings.bottom_height
    height_ratio = h / (settings.top_height - settings.bottom_height)
    dp = dot(ray_dir, sun_dir)
    dp2 = dp * dp
    dp4 = dp2 * dp2
    dp8 = dp4 * dp4
    # reference: max(pow(dp, 16.0), 0.0) — GLSL pow with a negative base is
    # undefined/NaN, which the max clamps to 0 in practice, so the glow only
    # exists looking TOWARD the sun; an even-power expansion must gate on the
    # sign or an anti-solar halo appears
    glow = jnp.where(dp > 0.0, dp8 * dp8, 0.0)
    return height_ratio + glow * (1.0 - alpha)


def get_light_raymarched(pos0: Vec3, sun_dir: Vec3, jitter, alpha0, time,
                         settings: CloudSettings, params,
                         shape_fn, coverage_fn, always_low: bool,
                         coverage_value=None, shape_value=None,
                         detail_value=None, unroll: bool = False):
    """6-step sun march (:104-151), step length ×1.2 growth, reach 0.15·layer.

    The reference picks full vs low density per pixel by ``alpha0 < 0.3``;
    with ``CLOUDS_ALWAYS_LOW_QUALITY`` both collapse to low.  When detail is
    live we evaluate both and select — masked lanes, not branches.

    ``coverage_value`` (the view march's interpolated raw coverage) is reused
    for every sun sample when provided: the whole march reaches only
    0.15·layer (≈half a world unit in the demo), over which the band-limited
    coverage field is effectively constant — same trade as coverage
    ray-interpolation, and it keeps the expensive warped field out of the
    6×-per-step inner loop.
    """
    steps = 6
    layer = settings.top_height - settings.bottom_height
    reach = layer * 0.15

    pos0_height = length(pos0) - settings.bottom_height
    pos0_height_ratio = pos0_height / layer

    import jax.lax as lax

    step_len0 = reach / float(steps)

    def body(i, carry):
        alpha, step_len = carry
        pos = pos0 + sun_dir * (i.astype(jnp.float32) * step_len)
        if always_low:
            density = get_density_full(pos, time, settings, params,
                                       shape_fn, coverage_fn, True, True,
                                       coverage_value=coverage_value,
                                       shape_value=shape_value)
        else:
            d_full = get_density_full(pos, time, settings, params,
                                      shape_fn, coverage_fn, False, False,
                                      coverage_value=coverage_value,
                                      shape_value=shape_value,
                                      detail_value=detail_value)
            d_low = get_density_full(pos, time, settings, params,
                                     shape_fn, coverage_fn, True, False,
                                     coverage_value=coverage_value,
                                     shape_value=shape_value)
            density = jnp.where(alpha0 < 0.3, d_full, d_low)
        density = density * (step_len * settings.density_scale)
        transmittance = jnp.exp(-density)
        alpha = alpha + (1.0 - transmittance) * (1.0 - alpha)
        return alpha, step_len * 1.2

    alpha, _ = lax.fori_loop(0, steps, body,
                             (jnp.zeros_like(alpha0), jnp.float32(1.0) * step_len0),
                             unroll=bool(unroll))

    light0 = pos0_height_ratio * 0.2
    return lerp(1.0, light0, alpha)


def get_light(pos: Vec3, ray_dir: Vec3, sun_dir: Vec3, jitter, alpha, time,
              settings: CloudSettings, params, shape_fn, coverage_fn,
              raymarched: bool, always_low: bool, pos_len=None,
              coverage_value=None, shape_value=None, detail_value=None,
              unroll: bool = False):
    """(:153-167): lighting model dispatch + planet shadow ×0.002."""
    if raymarched:
        light = get_light_raymarched(pos, sun_dir, jitter, alpha, time,
                                     settings, params, shape_fn, coverage_fn,
                                     always_low, coverage_value=coverage_value,
                                     shape_value=shape_value,
                                     detail_value=detail_value, unroll=unroll)
    else:
        light = get_light_cheap(pos, ray_dir, sun_dir, alpha, settings,
                                pos_len=pos_len)
    shadow = get_planet_shadow(pos, sun_dir, pos_len=pos_len)
    return light * lerp(1.0, 0.002, shadow)


def clamp_march_distance(ray_origin: Vec3, t_begin, t_end,
                         settings: CloudSettings):
    """March-distance horizon hack (:181-204): clamp the marched span between
    a "space" and a "ground" budget blended by camera height, so the horizon
    doesn't peer through the layer from orbit.  Idempotent."""
    march_distance_space = 0.5 * jnp.sqrt(jnp.maximum(
        1.0 - pow2(settings.ground_height / settings.top_height), 0.0)
    ) * settings.bottom_height
    march_distance_ground = 3.0 * march_distance_space
    max_d = lerp(
        march_distance_ground,
        march_distance_space,
        smoothstep(settings.bottom_height, settings.top_height * 1.05,
                   length(ray_origin)),
    )
    return t_begin + jnp.minimum(t_end - t_begin, max_d)


def _hat_interp(knots, u_scaled):
    """Piecewise-linear knot combination: Σₖ knotₖ·max(0, 1−|u−k|).
    ``u_scaled`` is a per-step scalar in [0, len(knots)−1]; the knots are
    pixel planes — each term is one scalar×plane fma, branch-free."""
    n = len(knots) - 1
    out = knots[0] * jnp.maximum(0.0, 1.0 - jnp.abs(u_scaled))
    for k in range(1, n + 1):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(u_scaled - float(k)))
        out = out + knots[k] * w
    return out


def _interp_field(endpoints, u01, dynamic: bool = False):
    """Interpolate a knot field at step phase ``u01`` ∈ [0, 1].

    ``endpoints`` is either a tuple of knot planes (the XLA path) or a
    callable accessor built by the megakernel's ``knot_store`` that
    dynamically indexes the two live knots out of a VMEM stack (only two hat
    weights are ever nonzero; agrees to float rounding, ~K/2× fewer plane
    ops).

    ``dynamic`` applies the same two-live-knot evaluation to the tuple
    form via ``lax.dynamic_index_in_dim`` over the stacked planes — the
    XLA twin of the kernel's knot stack (``VariantConfig.knot_dynamic``).
    Equal to the hat sum up to fma-contraction order: the dropped hat
    terms are exact ``+ 0.0`` (tests/test_knot_dynamic.py).  It also makes
    the XLA trace's COST a faithful inventory of the kernel's executed
    interpolation work — 2 loads + one lerp per field per step instead of
    K+1 plane fmas — which the roofline accounting lowers
    (``utils/profiling.frame_cost``, VERDICT r4 next #3)."""
    if callable(endpoints):
        return endpoints(u01)
    n = len(endpoints) - 1
    if dynamic and n >= 2:
        import jax.lax as lax

        us = u01 * float(n)
        i0 = jnp.clip(jnp.floor(us), 0.0, float(n - 1))
        f = us - i0
        stack = jnp.stack(endpoints)
        i0i = i0.astype(jnp.int32)
        k0 = lax.dynamic_index_in_dim(stack, i0i, keepdims=False)
        k1 = lax.dynamic_index_in_dim(stack, i0i + 1, keepdims=False)
        return k0 * (1.0 - f) + k1 * f
    return _hat_interp(endpoints, u01 * float(n))


def raymarch_cloud(ray_origin: Vec3, ray_dir: Vec3, t_begin, t_end, jitter,
                   sun_dir: Vec3, time, settings: CloudSettings, params,
                   shape_fn, coverage_fn, steps: int,
                   raymarched_lighting: bool, always_low: bool,
                   coverage_interp: bool = False, coverage_endpoints=None,
                   coverage_knots: int = 8, shape_endpoints=None,
                   detail_endpoints=None, unroll: bool = False,
                   knot_dynamic: bool = False):
    """``raymarch_cloud`` (:175-247).  Returns ``(total_light, alpha)``.

    Includes the march-distance horizon hack (:181-204): marching distance is
    clamped between a "space" and a "ground" budget blended by camera height,
    which keeps the horizon from peering through the layer from orbit.
    """
    t_end = clamp_march_distance(ray_origin, t_begin, t_end, settings)

    step_len = (t_end - t_begin) * (1.0 / float(steps))

    # carry-minimized march: position is affine in the step index (recomputed
    # from the start instead of carried — 3 fewer loop-carried planes, which
    # is real HBM traffic in the XLA while-loop), and alpha is derived from
    # the unclamped transmittance product (alpha = 1 − ∏tᵢ, exactly the
    # reference's incremental alpha accumulation at :228)
    start = ray_origin + ray_dir * (jitter * step_len) + ray_dir * t_begin

    if coverage_interp:
        # Fast-path quality/perf trade in the spirit of the reference's own
        # march-distance clamp (:181-204): sample the (expensive,
        # domain-warped) coverage field at K+1 knots along the marched
        # segment and piecewise-lerp per step instead of evaluating it
        # steps×/pixel.  K=1 is the old endpoint lerp; its error was
        # measured too large (p99 0.29 at the avatar pose — the segment
        # spans multiple periods of the scaled field), K=8 brings it to
        # blue-noise-jitter level (see tests/test_coverage_interp.py).
        if coverage_endpoints is not None:
            knots = coverage_endpoints
        else:
            K = max(int(coverage_knots), 1)
            knots = tuple(
                raw_coverage(ray_origin + ray_dir
                             * lerp(t_begin, t_end, k / float(K)),
                             params, coverage_fn)
                for k in range(K + 1))
    inv_steps_f = 1.0 / float(steps)

    def body(i, carry):
        prod, total_transmittance, total_light = carry
        fi = i.astype(jnp.float32)
        pos = start + ray_dir * (fi * step_len)
        pos_len = length(pos)  # shared by lighting, shadow and density
        alpha = 1.0 - prod
        u01 = (fi + 0.5) * inv_steps_f  # step phase along the march
        coverage_value = None
        if coverage_interp:
            coverage_value = _interp_field(knots, u01, dynamic=knot_dynamic)
        shape_value = (None if shape_endpoints is None else
                       _interp_field(shape_endpoints, u01,
                                     dynamic=knot_dynamic))
        detail_value = (None if detail_endpoints is None else
                        _interp_field(detail_endpoints, u01,
                                      dynamic=knot_dynamic))
        light = get_light(pos, ray_dir, sun_dir, jitter, alpha, time,
                          settings, params, shape_fn, coverage_fn,
                          raymarched_lighting, always_low, pos_len=pos_len,
                          coverage_value=coverage_value,
                          shape_value=shape_value, detail_value=detail_value,
                          unroll=unroll)
        density = get_density_full(pos, time, settings, params,
                                   shape_fn, coverage_fn, False, always_low,
                                   coverage_value=coverage_value,
                                   pos_len=pos_len, shape_value=shape_value,
                                   detail_value=detail_value)
        density = density * settings.density_scale

        transmittance = jnp.exp(-density * step_len)
        total_transmittance = jnp.maximum(total_transmittance * transmittance, 0.005)
        total_light = total_light + light * density * step_len * total_transmittance
        prod = prod * transmittance
        return prod, total_transmittance, total_light

    # lax.fori_loop keeps trace/compile time flat in the step count; the body
    # is large enough (noise recompute) that cross-step fusion isn't the win.
    import jax.lax as lax

    ones = jnp.ones_like(t_begin)
    prod, _, total_light = lax.fori_loop(
        0, steps, body, (ones, ones, jnp.zeros_like(t_begin)),
        unroll=bool(unroll))
    return total_light, 1.0 - prod


def render_clouds(albedo: Vec3, alpha, planet_center: Vec3,
                  ray_origin: Vec3, ray_dir: Vec3, linear_depth,
                  world_to_model, sun_dir: Vec3, jitter, time, params,
                  shape_fn, coverage_fn, steps: int,
                  raymarched_lighting: bool, always_low: bool,
                  coverage_interp: bool = False, cull: bool = False,
                  return_raw: bool = False, coverage_knots: int = 8,
                  coverage_lod: int = 1, normalize_layout=None,
                  shape_interp: bool = False, shape_knots: int = 16,
                  knot_group: int = 1, knot_store=None, unroll: bool = False,
                  knot_dynamic: bool = False):
    """``render_clouds`` (:249-324) over whole pixel planes.

    ``ray_origin``/``ray_dir``/``sun_dir``/``planet_center`` are **world**
    space; the reference works in view space and converts with
    ``u_world_to_model_matrix * INV_VIEW_MATRIX`` (:285-288) — we fold the
    view step and transform world→model directly (identical result).
    Returns updated ``(albedo, alpha)``.
    """
    from ..utils.camera import transform_dir, transform_point

    clouds_bottom = params.planet_radius + params.cloud_bottom * params.atmosphere_height
    clouds_top = params.planet_radius + params.cloud_top * params.atmosphere_height

    top0, top1 = ray_sphere(planet_center, clouds_top, ray_origin, ray_dir)
    hit_top = top0 != top1
    bot0, bot1 = ray_sphere(planet_center, clouds_bottom, ray_origin, ray_dir)

    t_begin = jnp.maximum(top0, 0.0)
    t_end = jnp.minimum(top1, linear_depth)

    # occlusion early-outs (:273-278) as a mask
    visible = jnp.logical_and(
        hit_top,
        jnp.logical_and(
            t_begin < linear_depth,
            jnp.logical_or(linear_depth > bot1, bot0 > 0.0),
        ),
    )

    ro_model = transform_point(world_to_model, ray_origin)
    rd_model = transform_dir(world_to_model, ray_dir)
    sd_model = transform_dir(world_to_model, sun_dir)

    settings = CloudSettings(
        bottom_height=clouds_bottom,
        top_height=clouds_top,
        density_scale=params.cloud_density_scale,
        ground_height=params.planet_radius,
    )

    # masked lanes march a degenerate [t_begin, t_begin] interval
    t_end_m = jnp.where(visible, t_end, t_begin)
    t_end_m = clamp_march_distance(ro_model, t_begin, t_end_m, settings)

    # knot field evaluators, all sampled at the same ray positions; shape
    # and detail reuse the coverage-knot machinery (texture mode cannot
    # afford per-step texture sampling, so the raw fields are evaluated at
    # K knots and hat-interpolated per step — tests/test_shape_interp.py
    # bounds the deviation)
    def _cov_field(pos):
        return raw_coverage(pos, params, coverage_fn)

    def _shape_field(pos):
        return shape_fn(pos * params.cloud_shape_scale)

    def _detail_field(pos):
        t = time * 0.01
        return shape_fn(pos * 15.0 + Vec3(t, t, t))

    def _field_plan():
        plan = []
        if coverage_interp:
            plan.append(("cov", _cov_field, max(int(coverage_knots), 1)))
        if shape_interp:
            plan.append(("shp", _shape_field, max(int(shape_knots), 1)))
            if not always_low:
                plan.append(("det", _detail_field, max(int(shape_knots), 1)))
        return plan

    def _eval_knots(field, K, ro, rd, t0, t1):
        """Evaluate ``field`` at the K+1 ray knots.

        ``knot_group`` > 1 stacks G adjacent knots' position planes along
        the sublane axis and evaluates them in ONE field call — for the
        in-kernel texture samplers this amortizes the per-batch fixed costs
        (footprint/level-select scalars, the windowed/floor cond, the scan
        loop's load+broadcast) G-ways; a straddling segment then costs one
        whole-level scan for the group instead of G.  The positions are
        identical either way, so results are bit-equal for elementwise
        (procedural) fields; texture fields may pick one coarser mip for
        the group (the union footprint) — part of the measured texture-mode
        envelope (tests/test_texture_mode.py)."""
        pts = [ro + rd * lerp(t0, t1, k / float(K)) for k in range(K + 1)]
        G = max(int(knot_group), 1)
        if G <= 1:
            return tuple(field(p) for p in pts)
        h = pts[0].x.shape[0]
        out = []
        for g0 in range(0, K + 1, G):
            grp = pts[g0:g0 + G]
            stacked = Vec3(
                jnp.concatenate([p.x for p in grp], axis=0),
                jnp.concatenate([p.y for p in grp], axis=0),
                jnp.concatenate([p.z for p in grp], axis=0))
            vals = field(stacked)
            out.extend(vals[i * h:(i + 1) * h] for i in range(len(grp)))
        return tuple(out)

    def compute_knots():
        plan = _field_plan()
        if coverage_lod <= 1:
            return {
                name: _eval_knots(field, K, ro_model, rd_model,
                                  t_begin, t_end_m)
                for name, field, K in plan}
        # knots at reduced vertical resolution: the coverage field is the
        # component the reference itself band-limits (to a 256² cubemap),
        # so sampling it every `coverage_lod` rows and nearest-upsampling
        # stays within the reference's own information budget while making
        # the expensive warped-field evaluations ~coverage_lod× cheaper
        h = t_begin.shape[0]
        w = t_begin.shape[-1]
        if h % coverage_lod:
            raise ValueError(f"cloud_coverage_lod={coverage_lod} needs a "
                             f"row count divisible by it (got {h})")
        hk = h // coverage_lod

        def down(x):
            return x.reshape(hk, coverage_lod, w).mean(axis=1)

        rd_k = Vec3(down(rd_model.x), down(rd_model.y), down(rd_model.z))
        t0_k, t1_k = down(t_begin), down(t_end_m)
        if normalize_layout is not None:
            # the expensive warped-field evals must not consume strided-
            # layout inputs (the downsample products) — normalize first
            rkx, rky, rkz, t0_k, t1_k = normalize_layout(
                (rd_k.x, rd_k.y, rd_k.z, t0_k, t1_k))
            rd_k = Vec3(rkx, rky, rkz)
        out = {}
        for name, field, K in plan:
            knots_c = _eval_knots(field, K, ro_model, rd_k, t0_k, t1_k)
            knots = tuple(jnp.repeat(c, coverage_lod, axis=0)
                          for c in knots_c)
            if normalize_layout is not None:
                # same Mosaic layout hazard as render_clouds_lod:
                # reshape/repeat products poison the march loop —
                # round-trip through VMEM
                knots = normalize_layout(knots)
            out[name] = knots
        return out

    def march(knots):
        knots = knots or {}
        if knot_store is not None:
            # megakernel dynamic-knot mode: park each field's knot planes in
            # the VMEM knot stack and hand the march an accessor (2 dynamic
            # loads per step) instead of the plane tuple (K+1 fmas per
            # step).  Done here — after the cull bound consumed the raw
            # coverage tuple above.
            knots = {name: knot_store(name, planes)
                     for name, planes in knots.items()}
        light, a = raymarch_cloud(
            ro_model, rd_model, t_begin, t_end_m, jitter, sd_model, time,
            settings, params, shape_fn, coverage_fn, steps,
            raymarched_lighting, always_low, coverage_interp=coverage_interp,
            coverage_endpoints=knots.get("cov"),
            coverage_knots=coverage_knots,
            shape_endpoints=knots.get("shp"),
            detail_endpoints=knots.get("det"), unroll=unroll,
            knot_dynamic=knot_dynamic and knot_store is None)
        return light, a

    if cull:
        # per-tile occlusion early-out (:273-278) — the reference reports it
        # saves ~0.5 ms/frame in ground views; here whole tiles skip the
        # knot evaluation AND the march.  Off-screen/occluded tiles cost
        # only the shell intersections.
        import jax.lax as lax

        zero = jnp.zeros_like(t_begin)

        def visible_branch():
            if not (coverage_interp or shape_interp):
                return march(None)
            knots = compute_knots()
            if not coverage_interp:
                return march(knots)
            # conservative per-pixel density bound: the procedural noise
            # bases can overshoot [-1, 1] slightly (perlin ×1.15, simplex's
            # approximate normalization), so shape = lerp(0.5, s, factor) is
            # bounded by 0.5 + 0.575·|factor| (also valid under invert);
            # detail is 0.5 in low mode and height_curve ≤ 1.  Density can
            # only be nonzero where the (hat-interpolated) coverage — whose
            # max over the segment is the max over knots — clears this
            # threshold; tiles of cloud-free sky skip the march.
            shape_bound = 0.5 + 0.575 * jnp.abs(params.cloud_shape_factor)
            detail_term = 0.1 if always_low else 0.0
            cov_knots = knots["cov"]
            cov_max = cov_knots[0]
            for cov_k in cov_knots[1:]:
                cov_max = jnp.maximum(cov_max, cov_k)
            cov_max = cov_max + params.cloud_coverage_bias
            max_density = (shape_bound - detail_term
                           + lerp(-1.2, 1.5, cov_max)) * 50.0 - 20.0
            cull_mask = jnp.logical_and(visible, max_density > 0.0)
            return lax.cond(jnp.any(cull_mask), lambda: march(knots),
                            lambda: (zero, zero))

        cloud_light, cloud_alpha = lax.cond(
            jnp.any(visible), visible_branch, lambda: (zero, zero))
    else:
        cloud_light, cloud_alpha = march(
            compute_knots() if (coverage_interp or shape_interp) else None)

    if return_raw:
        return cloud_light, cloud_alpha, visible

    return apply_cloud_blend(albedo, alpha, cloud_light, cloud_alpha,
                             visible, params.cloud_blend)


def render_clouds_lod(albedo: Vec3, alpha, planet_center: Vec3,
                      ray_origin: Vec3, ray_dir: Vec3, linear_depth,
                      world_to_model, sun_dir: Vec3, jitter, time, params,
                      shape_fn, coverage_fn, steps: int,
                      raymarched_lighting: bool, always_low: bool,
                      lod: int, coverage_interp: bool = False,
                      cull: bool = False, coverage_knots: int = 8,
                      coverage_lod: int = 1, normalize_layout=None,
                      shape_interp: bool = False, shape_knots: int = 16,
                      knot_group: int = 1, knot_store=None,
                      unroll: bool = False, knot_dynamic: bool = False):
    """Vertical cloud LOD: march once per ``lod``-row group, blend full-res.

    The TPU analog of rendering clouds into a reduced-resolution buffer
    (a quality/perf trade the reference can't express — its fragment shader
    runs per pixel).  Implementation constraints come from Mosaic: the only
    layout ops a TPU kernel supports here are ``reshape(h//lod, lod, w)``
    reductions (downsample) and ``jnp.repeat`` sublane interleave (nearest
    upsample), so the LOD is vertical-only and nearest — no cross-row filter
    taps, which also keeps the XLA and megakernel paths bit-identical (no
    tile-boundary clamping divergence).

    Coarse inputs per row group: the renormalized mean of the member rays
    (for adjacent pinhole rays this is the group's center ray to ~1e-7),
    the min of their depths (conservative occlusion), the first row's
    jitter (preserves the blue-noise distribution).  Atmosphere scattering
    and the final blend stay per-pixel; only cloud light/alpha/visibility
    are group-constant.
    """
    h = albedo.x.shape[0]
    w = albedo.x.shape[-1]
    if h % lod:
        raise ValueError(f"cloud_lod={lod} needs row count divisible by it "
                         f"(got {h})")
    hc = h // lod

    def down_mean(x):
        return x.reshape(hc, lod, w).mean(axis=1)

    def down_min(x):
        return x.reshape(hc, lod, w).min(axis=1)

    def down_first(x):
        # max over a masked reshape keeps "row 0 of each group" expressible
        # with supported ops (plain [:, 0, :] indexing lowers to the same
        # strided extract Mosaic rejects)
        import jax.lax as lax

        sel = (lax.broadcasted_iota(jnp.int32, (hc, lod, w), 1) == 0)
        return jnp.where(sel, x.reshape(hc, lod, w), -jnp.inf).max(axis=1)

    def up(x):
        return jnp.repeat(x, lod, axis=0)

    rdm = Vec3(down_mean(ray_dir.x), down_mean(ray_dir.y),
               down_mean(ray_dir.z))
    inv = 1.0 / jnp.sqrt(rdm.x * rdm.x + rdm.y * rdm.y + rdm.z * rdm.z)
    ray_dir_c = Vec3(rdm.x * inv, rdm.y * inv, rdm.z * inv)
    depth_c = down_min(linear_depth)
    jitter_c = down_first(jitter)

    if normalize_layout is not None:
        # Mosaic layout hazard: values produced by the (hc, lod, w)
        # reshape-reduce carry a strided layout that poisons every op of the
        # downstream march (measured 8× slowdown of the whole kernel).  The
        # megakernel passes a VMEM-scratch round-trip here to force the
        # planes back to the native layout before they enter the loop.
        rdx, rdy, rdz, depth_c, jitter_c = normalize_layout(
            (ray_dir_c.x, ray_dir_c.y, ray_dir_c.z, depth_c, jitter_c))
        ray_dir_c = Vec3(rdx, rdy, rdz)

    zero_c = jnp.zeros((hc, w), jnp.float32)
    light_c, alpha_c, visible_c = render_clouds(
        Vec3(zero_c, zero_c, zero_c), zero_c, planet_center, ray_origin,
        ray_dir_c, depth_c, world_to_model, sun_dir, jitter_c, time, params,
        shape_fn, coverage_fn, steps, raymarched_lighting, always_low,
        coverage_interp=coverage_interp, cull=cull, return_raw=True,
        coverage_knots=coverage_knots, coverage_lod=coverage_lod,
        normalize_layout=normalize_layout, shape_interp=shape_interp,
        shape_knots=shape_knots, knot_group=knot_group,
        knot_store=knot_store, unroll=unroll, knot_dynamic=knot_dynamic)

    return apply_cloud_blend(albedo, alpha, up(light_c), up(alpha_c),
                             up(visible_c.astype(jnp.float32)) > 0.5,
                             params.cloud_blend)


def apply_cloud_blend(albedo: Vec3, alpha, cloud_light, cloud_alpha, visible,
                      cloud_blend):
    """Blend the cloud layer over the atmosphere (:296-321): a mix of
    premultiplied alpha blending and additive blending by ``u_cloud_blend``,
    with occluded pixels passing the atmosphere through unchanged."""
    cloud_albedo = Vec3(cloud_light, cloud_light, cloud_light)
    blended_rgb, blended_a = blend_colors(albedo, alpha, cloud_albedo, cloud_alpha)
    add_rgb = albedo + cloud_albedo * cloud_alpha
    add_a = jnp.maximum(alpha, cloud_alpha)

    cb = cloud_blend
    out_rgb = Vec3(lerp(blended_rgb.x, add_rgb.x, cb),
                   lerp(blended_rgb.y, add_rgb.y, cb),
                   lerp(blended_rgb.z, add_rgb.z, cb))
    out_a = lerp(blended_a, add_a, cb)

    out_rgb = Vec3(jnp.where(visible, out_rgb.x, albedo.x),
                   jnp.where(visible, out_rgb.y, albedo.y),
                   jnp.where(visible, out_rgb.z, albedo.z))
    out_a = jnp.where(visible, out_a, alpha)
    return out_rgb, out_a
