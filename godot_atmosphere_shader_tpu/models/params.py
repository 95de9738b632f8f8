"""Runtime parameters and compile-time variant configs.

The reference splits its configuration into three tiers
(``SURVEY.md §5 config``):

1. compile-time shader ``#define`` matrix (one ``.gdshader`` file per variant,
   ``/root/reference/addons/zylann.atmosphere/shaders/*.gdshader``) —
   here :class:`VariantConfig`, a frozen hashable dataclass used as a jit
   static argument so each variant compiles its own fused kernel;
2. runtime shader uniforms (``planet_atmosphere.gd:185-218`` exposes them by
   reflection) — here :class:`AtmosphereParams`, a traced pytree whose fields
   carry the same names as the uniforms minus the ``u_`` prefix, with the
   same defaults as the shader declarations;
3. scene files overriding both — ``models/scene.py`` + dict serialization.

Color-typed uniforms (``source_color``) are declared in sRGB in the shaders
and converted by Godot; constructors here take sRGB and store linear.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.noise import NoiseSpec
from ..utils.color import srgb_to_linear


def _f32(v):
    return jnp.asarray(v, jnp.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AtmosphereParams:
    """The uniform surface of one atmosphere (SURVEY.md §2.4), as a pytree."""

    # planet_common.gdshaderinc:4-6
    planet_radius: jnp.ndarray
    atmosphere_height: jnp.ndarray
    sun_position: jnp.ndarray  # (3,) world space

    # atmosphere_common.gdshaderinc:10
    density: jnp.ndarray

    # planet_atmosphere_main.gdshaderinc:60
    sphere_depth_factor: jnp.ndarray

    # atmosphere_funcs_v2.gdshaderinc:8-11 (colors stored linear)
    scattering_strength: jnp.ndarray
    scattering_wavelengths: jnp.ndarray  # (3,)
    atmosphere_modulate: jnp.ndarray  # (3,)
    atmosphere_ambient_color: jnp.ndarray  # (3,)

    # atmosphere_funcs_v1.gdshaderinc:8-12 (colors stored linear)
    day_color0: jnp.ndarray  # (3,)
    day_color1: jnp.ndarray
    night_color0: jnp.ndarray
    night_color1: jnp.ndarray
    day_night_transition_scale: jnp.ndarray

    # cloud_funcs.gdshaderinc:5-16
    cloud_density_scale: jnp.ndarray
    cloud_bottom: jnp.ndarray
    cloud_top: jnp.ndarray
    cloud_blend: jnp.ndarray
    cloud_shape_invert: jnp.ndarray
    cloud_coverage_bias: jnp.ndarray
    cloud_shape_factor: jnp.ndarray
    cloud_shape_scale: jnp.ndarray
    cloud_coverage_rotation: jnp.ndarray  # (2, 2), animated by the scene layer
    world_to_model: jnp.ndarray  # (4, 4)
    time: jnp.ndarray  # TIME uniform analog (detail noise animation)

    # optional baked media (traced arrays; None ⇒ procedural per config)
    optical_depth_lut: Optional[jnp.ndarray] = None  # (256, 256)
    cloud_shape_texture: Optional[jnp.ndarray] = None  # (D, H, W) repeat-wrapped
    cloud_coverage_cubemap: Optional[jnp.ndarray] = None  # (6, res, res)

    # packed per-frame dynamics: (24,) = sun_position(3) ‖ world_to_model(16)
    # ‖ coverage_rotation(4) ‖ time(1).  When present it overrides those four
    # fields inside jit — one host→device upload per frame instead of four
    # (each separate upload costs a tunnel round-trip on axon-style setups).
    frame_state: Optional[jnp.ndarray] = None

    def resolve_frame_state(self) -> "AtmosphereParams":
        """Unpack ``frame_state`` into the individual fields (traced)."""
        if self.frame_state is None:
            return self
        fs = self.frame_state
        return dataclasses.replace(
            self,
            sun_position=fs[0:3],
            world_to_model=fs[3:19].reshape(4, 4),
            cloud_coverage_rotation=fs[19:23].reshape(2, 2),
            time=fs[23],
            frame_state=None,
        )

    @staticmethod
    def pack_frame_state(sun_position, world_to_model, coverage_rotation,
                         time_s) -> np.ndarray:
        out = np.empty(24, np.float32)
        out[0:3] = np.asarray(sun_position, np.float32)
        out[3:19] = np.asarray(world_to_model, np.float32).reshape(-1)
        out[19:23] = np.asarray(coverage_rotation, np.float32).reshape(-1)
        out[23] = time_s
        return out

    @staticmethod
    def create(planet_radius=1.0, atmosphere_height=0.1,
               sun_position=(5000.0, 0.0, 0.0), density=0.2,
               sphere_depth_factor=0.0, scattering_strength=20.0,
               scattering_wavelengths=(700.0, 530.0, 440.0),
               atmosphere_modulate=(1.0, 1.0, 1.0),
               atmosphere_ambient_color=(0.0, 0.0, 0.002),
               day_color0=(0.5, 0.8, 1.0), day_color1=(0.5, 0.8, 1.0),
               night_color0=(0.2, 0.4, 0.8), night_color1=(0.2, 0.4, 0.8),
               day_night_transition_scale=2.0,
               cloud_density_scale=50.0, cloud_bottom=0.2, cloud_top=0.5,
               cloud_blend=0.5, cloud_shape_invert=0.0,
               cloud_coverage_bias=0.0, cloud_shape_factor=0.8,
               cloud_shape_scale=1.0, cloud_coverage_rotation=None,
               world_to_model=None, time=0.0,
               optical_depth_lut=None, cloud_shape_texture=None,
               cloud_coverage_cubemap=None,
               colors_are_srgb: bool = True) -> "AtmosphereParams":
        """Build params with the shader-declaration defaults.

        ``colors_are_srgb=True`` mirrors Godot's ``source_color`` handling
        for the modulate/ambient/day/night colors.
        """
        conv = srgb_to_linear if colors_are_srgb else _f32
        if cloud_coverage_rotation is None:
            cloud_coverage_rotation = jnp.eye(2, dtype=jnp.float32)
        if world_to_model is None:
            world_to_model = jnp.eye(4, dtype=jnp.float32)
        return AtmosphereParams(
            planet_radius=_f32(planet_radius),
            atmosphere_height=_f32(atmosphere_height),
            sun_position=_f32(sun_position),
            density=_f32(density),
            sphere_depth_factor=_f32(sphere_depth_factor),
            scattering_strength=_f32(scattering_strength),
            scattering_wavelengths=_f32(scattering_wavelengths),
            atmosphere_modulate=conv(atmosphere_modulate),
            atmosphere_ambient_color=conv(atmosphere_ambient_color),
            day_color0=conv(day_color0), day_color1=conv(day_color1),
            night_color0=conv(night_color0), night_color1=conv(night_color1),
            day_night_transition_scale=_f32(day_night_transition_scale),
            cloud_density_scale=_f32(cloud_density_scale),
            cloud_bottom=_f32(cloud_bottom),
            cloud_top=_f32(cloud_top),
            cloud_blend=_f32(cloud_blend),
            cloud_shape_invert=_f32(cloud_shape_invert),
            cloud_coverage_bias=_f32(cloud_coverage_bias),
            cloud_shape_factor=_f32(cloud_shape_factor),
            cloud_shape_scale=_f32(cloud_shape_scale),
            cloud_coverage_rotation=_f32(cloud_coverage_rotation),
            world_to_model=_f32(world_to_model),
            time=_f32(time),
            optical_depth_lut=optical_depth_lut,
            cloud_shape_texture=cloud_shape_texture,
            cloud_coverage_cubemap=cloud_coverage_cubemap,
        )


@dataclasses.dataclass(frozen=True)
class ProceduralField:
    """A procedural stand-in for a baked texture: noise spec + domain scale.

    For the cloud *shape* field, ``scale`` is the texture-period analog (the
    reference's ``NoiseTexture3D`` holds noise over a 64³ voxel grid, so one
    texture-coordinate unit spans 64 noise units).  For the *coverage* field
    it is the ``NoiseCubemap.scale`` property applied to the unit direction
    (``noise_cubemap.gd:38,130``).
    """

    noise: NoiseSpec
    scale: Tuple[float, float, float] = (64.0, 64.0, 64.0)


@dataclasses.dataclass(frozen=True)
class VariantConfig:
    """Compile-time variant switches — the reference's ``#define`` matrix.

    Hashable; passing a different config re-specializes the jitted render.
    ``od_mode``/field specs are TPU-build extensions: they choose between
    reference-parity texture sampling and the gather-free arithmetic path.
    """

    model: str = "v2"  # "v1" (ATMOSPHERE_LITE) | "v2"
    atmosphere_steps: int = 8  # ATMOSPHERE_RAYMARCH_STEPS
    clouds_enabled: bool = False  # CLOUDS_ENABLED
    cloud_steps: int = 32  # CLOUDS_MAX_RAYMARCH_STEPS
    raymarched_lighting: bool = False  # CLOUDS_RAYMARCHED_LIGHTING
    clouds_always_low_quality: bool = True  # set in planet_atmosphere_main.gdshaderinc:49
    reverse_z: bool = True  # REVERSE_Z
    od_mode: str = "analytic"  # "analytic" | "lut"
    # procedural field specs (None ⇒ sample the baked texture from params)
    cloud_shape_noise: Optional[ProceduralField] = None
    cloud_coverage_noise: Optional[ProceduralField] = None
    # fast-path switches (quality/perf trades in the spirit of the
    # reference's own march-distance clamp):
    # piecewise-linear raw coverage along the marched segment instead of
    # per-step field evaluation: the (expensive, domain-warped) field is
    # sampled at cloud_coverage_knots+1 points and hat-interpolated per
    # step.  Measured bounds live in tests/test_coverage_interp.py.
    cloud_coverage_interp: bool = False
    cloud_coverage_knots: int = 8
    # evaluate the coverage knots every `cloud_coverage_lod` rows (relative
    # to the cloud march resolution) and nearest-upsample — the vertical
    # analog of the reference band-limiting coverage to a 256² cubemap
    cloud_coverage_lod: int = 1
    # per-tile conditional skip of the integrators where no ray hits the
    # shell — the idiomatic analog of the far cube mesh limiting shaded
    # pixels (planet_atmosphere.gd:261-282)
    tile_cull: bool = True
    # vertical cloud LOD: march the cloud layer once per `cloud_lod`-row
    # group of pixels and nearest-upsample light/alpha before blending
    # (atmosphere stays full-res).  1 = off (reference-parity).  The TPU
    # analog of rendering clouds in a reduced-resolution buffer; see
    # ops/clouds.py::render_clouds_lod for the quality envelope.
    cloud_lod: int = 1
    # camera-conditional vertical LOD: when nonzero and the camera is
    # INSIDE the atmosphere shell (d < R+H, released at 1.1·(R+H) — the
    # same hysteresis ratio as the reference's near/far mesh switch,
    # planet_atmosphere.gd:300-312), the march uses THIS cloud_lod
    # instead.  The in-shell pose marches the cloud layer at full screen
    # coverage, where the row-group march is cheapest per unit of error:
    # measured at 1080p interior, lod 4 renders 21.47→10.55 ms
    # (96.6→196.6 Mrays/s) at mean |Δ| 0.0012 vs the full-res march —
    # 1.38× the delta of the accepted lod-2 default (0.00087), max
    # near-unchanged (0.204 vs 0.190).  0 disables the policy.
    cloud_lod_interior: int = 0
    # raw shape/detail fields evaluated at cloud_shape_knots+1 ray knots and
    # hat-interpolated per step instead of per-step evaluation — the same
    # trade as cloud_coverage_interp, extended to the shape texture.  The
    # in-kernel texture mode requires it (per-step texture sampling would be
    # ~40 windowed lookups per pixel); procedural fields may opt in.
    cloud_shape_interp: bool = False
    cloud_shape_knots: int = 16
    # evaluate the knot interpolation by dynamically indexing the two live
    # knots (2 loads + 2 scalar-weight fmas per field per step) instead of
    # the branch-free K+1-term hat sum (K+1 plane fmas).  In the megakernel
    # the knots live in a VMEM stack scratch; on the XLA path (since r5)
    # the same semantics via ``lax.dynamic_index_in_dim`` over the stacked
    # planes — which also makes the XLA trace's cost model a faithful
    # inventory of the kernel's executed interpolation work
    # (``utils/profiling.frame_cost``).  Only two hat weights are ever
    # nonzero and the step phase is a per-step *scalar*, so the result
    # matches the hat sum to float rounding (measured ≤7e-7 at demo scale;
    # fma-contraction order is the only difference — the dropped hat terms
    # are exact +0.0 contributions).  See ROADMAP #13.
    knot_dynamic: bool = False
    # -- in-kernel texture mode (megakernel with baked textures) ------------
    # static pyramid descriptions, set by the scene plumbing when the layer
    # carries baked textures; the pyramid DATA rides params/extra inputs.
    # See ops/pallas/texsample.py for the sampling scheme and its quality
    # envelope (windowed mip selection, whole-level floor on wrap straddle).
    cloud_shape_tex_meta: object = None
    cloud_coverage_tex_meta: object = None
    # VMEM window budget per windowed (trilinear) texture lookup batch, in
    # rows of 128 texels.  Smaller = faster scans but one mip level coarser
    # for fine footprints; the wrap-straddle floor level is independent
    # (texsample.TexMeta.floor_level).  16 measured as the perf/quality
    # knee at 1080p; raise for close-up texture fidelity.
    texture_window_rows: int = 16
    # per-z-slice band budget for the banded sampler mode (ROADMAP #9):
    # when a batch's (y, x) footprint is compact but the z span's S² flat
    # pitch blows the contiguous window (1:1 close-ups), the sampler loops
    # the touched z-slices with per-slice windows of this many rows,
    # restoring fine-level trilinear where windowed mode mips down.
    # 0 disables.  Engages only where it reaches a strictly finer level.
    texture_band_rows: int = 16
    # slice-count cap for banded mode: footprints spanning more z-slices
    # than this are genuinely minified, so mip-down is the correct filter
    texture_band_max_slices: int = 32
    # per-frame jitter decorrelation for temporal accumulation: offsets the
    # blue-noise plane by frac(time*phi-multiple) so accumulated frames
    # sample different march offsets/dither (the reference is stuck with a
    # static pattern because it cannot reproject,
    # planet_atmosphere_main.gdshaderinc:39-48)
    temporal_jitter: bool = False
    # knots evaluated per stacked texture-sampler call: amortizes per-batch
    # fixed costs (level select, windowed/floor cond, scan load+broadcast)
    # G-ways at the cost of the group sharing one mip level (the union
    # footprint).  Applied only when texture metas are present.
    texture_knot_group: int = 8
    # seamless cubemap filtering (PARITY #10): GL's samplerCube blends
    # across face boundaries (`cloud_funcs.gdshaderinc:45`); when True the
    # XLA coverage sampler extends the cubemap with a 1-texel adjacent-face
    # border per frame and samples the extended stack
    # (ops/sampling.py::sample_cubemap_seamless) — seam-band error drops
    # from 3.5e-3 to the 4e-4 bilinear filter floor, interior footprints
    # match per-face clamp to 1 ulp (measured, tests/test_seam.py).  False
    # = per-face clamp, the semantics the GDShader-text oracle transcribes
    # (hardware seam blending isn't in the shader text).
    cubemap_seamless: bool = True
    # cost-analysis instrumentation, NOT a render knob: unroll every march
    # fori_loop at trace time so XLA's cost model counts each step (it
    # counts a `while` body ONCE, not ×trip-count — measured, which made
    # the r4 roofline fields undercount march work).  Lower step counts to
    # 1-2 before lowering with this on (utils/profiling.frame_cost does);
    # unrolling a 64-step march would explode compile time.  Unrolling is
    # float-rounding-inert, not bitwise (XLA reassociates fma contraction
    # across unrolled iterations; measured ≤7.5e-7) — renders always keep
    # the default False.
    march_unroll: bool = False


#: The reference's shader variant files, name → config
#: (``/root/reference/addons/zylann.atmosphere/shaders/planet_atmosphere*.gdshader``).
VARIANTS = {
    "no_clouds": VariantConfig(model="v2", atmosphere_steps=8),
    "clouds": VariantConfig(model="v2", atmosphere_steps=8,
                            clouds_enabled=True, cloud_steps=32),
    "clouds_high": VariantConfig(model="v2", atmosphere_steps=8,
                                 clouds_enabled=True, cloud_steps=64),
    "clouds_high_rm": VariantConfig(model="v2", atmosphere_steps=8,
                                    clouds_enabled=True, cloud_steps=64,
                                    raymarched_lighting=True),
    "v1_no_clouds": VariantConfig(model="v1", atmosphere_steps=16),
    "v1_clouds": VariantConfig(model="v1", atmosphere_steps=16,
                               clouds_enabled=True, cloud_steps=32),
    "v1_clouds_high": VariantConfig(model="v1", atmosphere_steps=16,
                                    clouds_enabled=True, cloud_steps=64),
}

DEFAULT_VARIANT = "no_clouds"  # planet_atmosphere.gd:13-14

#: Named step-count profiles beyond the reference's 7 shader files, from the
#: reference's own in-source guidance.  ``gas_giant`` is the 64-step
#: atmosphere tier ``atmosphere_funcs_v2.gdshaderinc:42-43`` anticipates
#: ("Rocky planets don't need much [8 works], gas giants need more
#: [64 works]") — in the reference a user reaches it by editing
#: ``ATMOSPHERE_RAYMARCH_STEPS`` in a custom shader (our ``.gdshader``
#: importer synthesizes the same config from that #define).  Measured basis
#: for 64 (``tools/gas_giant_study.py`` → GAS_GIANT_STUDY.json, pinned by
#: ``tests/test_gas_giant.py``): on optically-thick full-traversal rays at
#: R/H = 40–100, the 8-step march is off by up to 0.26–0.34 vs converged
#: while 64 steps reach 0.035–0.057; the analytic sun-OD path needs NO
#: extra quadrature there (GL-8 rel error ≤ 5.5e-5 at OD up to 1.9e5 —
#: the reference's own 256² LUT carries 3.1%).
PROFILES = {
    "gas_giant": VariantConfig(model="v2", atmosphere_steps=64),
}
