"""Scene API: the ``PlanetAtmosphere`` node re-imagined as a param manager.

Mirrors ``/root/reference/addons/zylann.atmosphere/planet_atmosphere.gd``:
the same exported properties (``planet_radius``, ``atmosphere_height``,
``sun_path``→``sun``, ``custom_shader``→variant config,
``clouds_rotation_speed``, ``force_fullscreen``), the same
``set_shader_parameter``/``get_shader_parameter`` surface accepting the
``u_*`` uniform names, the same rebake-on-change optical-depth semantics, and
the same near/far LOD mode switch with its 1.1 hysteresis margin.  Instead of
driving a ``ShaderMaterial`` every ``_process`` tick, ``update()`` refreshes a
pytree of parameters that the jitted renderer consumes.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops.optical_depth import OpticalDepthCache
from ..render.opaque import OpaqueScene
from ..render.renderer import render_frame
from ..utils.camera import Camera
from ..utils.color import srgb_to_linear
from .params import AtmosphereParams, VariantConfig, VARIANTS, DEFAULT_VARIANT

MODE_NEAR = 0
MODE_FAR = 1
SWITCH_MARGIN_RATIO = 1.1  # planet_atmosphere.gd:11
#: Auto-enable camera-relative (large-world) rendering beyond this distance
#: from the world origin: f32 spacing there is 2^-9 ≈ 2 mm — still fine — but
#: Earth-scale scenes (~6.4e6, spacing 0.5 m) march visibly quantized without
#: the rebase.  The reference gates this on an engine build flag instead
#: (DOUBLE_PRECISION, ``planet_atmosphere_main.gdshaderinc:24-25``).
LARGE_WORLD_THRESHOLD = 32768.0

#: set internally by the node; hidden from the user param surface
#: (planet_atmosphere.gd:68-77)
_API_SHADER_PARAMS = frozenset({
    "u_planet_radius", "u_atmosphere_height", "u_clip_mode", "u_sun_position",
    "u_world_to_model_matrix", "u_blue_noise_texture",
    "u_cloud_coverage_rotation", "u_optical_depth_texture",
})

# Rebake-on-change note: the reference tracks params affecting the LUT
# explicitly (planet_atmosphere.gd:79-81, {u_density}); here the same
# semantics fall out of OpticalDepthCache's key (R, H, density) — any change
# to those values yields a new cache key and therefore a rebake.

#: ``source_color`` uniforms: sRGB in, linear stored
_COLOR_PARAMS = frozenset({
    "u_atmosphere_modulate", "u_atmosphere_ambient_color",
    "u_day_color0", "u_day_color1", "u_night_color0", "u_night_color1",
})

#: uniform name → AtmosphereParams field
_UNIFORM_TO_FIELD = {
    "u_planet_radius": "planet_radius",
    "u_atmosphere_height": "atmosphere_height",
    "u_sun_position": "sun_position",
    "u_density": "density",
    "u_sphere_depth_factor": "sphere_depth_factor",
    "u_scattering_strength": "scattering_strength",
    "u_scattering_wavelengths": "scattering_wavelengths",
    "u_atmosphere_modulate": "atmosphere_modulate",
    "u_atmosphere_ambient_color": "atmosphere_ambient_color",
    "u_day_color0": "day_color0",
    "u_day_color1": "day_color1",
    "u_night_color0": "night_color0",
    "u_night_color1": "night_color1",
    "u_day_night_transition_scale": "day_night_transition_scale",
    "u_cloud_density_scale": "cloud_density_scale",
    "u_cloud_bottom": "cloud_bottom",
    "u_cloud_top": "cloud_top",
    "u_cloud_blend": "cloud_blend",
    "u_cloud_shape_invert": "cloud_shape_invert",
    "u_cloud_coverage_bias": "cloud_coverage_bias",
    "u_cloud_shape_factor": "cloud_shape_factor",
    "u_cloud_shape_scale": "cloud_shape_scale",
    "u_cloud_shape_texture": "cloud_shape_texture",
    "u_cloud_coverage_cubemap": "cloud_coverage_cubemap",
    "u_world_to_model_matrix": "world_to_model",
    "u_cloud_coverage_rotation": "cloud_coverage_rotation",
    "u_optical_depth_texture": "optical_depth_lut",
}


class Node3D:
    """Minimal scene-tree node: a global transform."""

    def __init__(self, position=(0.0, 0.0, 0.0), transform=None, name=""):
        if transform is None:
            transform = np.eye(4)
            transform[:3, 3] = position
        # float64 host storage: world positions stay full-precision so the
        # large-world camera rebase (DOUBLE_PRECISION analog) has exact
        # coordinates to subtract; everything is cast to f32 only at
        # frame-state pack time
        self.transform = np.asarray(transform, np.float64)
        self.name = name

    @property
    def position(self):
        return self.transform[:3, 3]


class PlanetAtmosphere(Node3D):
    """The reference node's API over a params pytree."""

    def __init__(self, planet_radius: float = 1.0, atmosphere_height: float = 0.1,
                 sun: Optional[Node3D] = None,
                 custom_shader=None,  # variant name or VariantConfig
                 clouds_rotation_speed: float = 1.0,
                 force_fullscreen: bool = False,
                 position=(0.0, 0.0, 0.0), transform=None, name="PlanetAtmosphere",
                 **shader_params):
        super().__init__(position=position, transform=transform, name=name)
        self._params = AtmosphereParams.create(
            planet_radius=planet_radius, atmosphere_height=atmosphere_height)
        self._sun_position_host = np.array([5000.0, 0.0, 0.0], np.float32)
        self._config = VARIANTS[DEFAULT_VARIANT]
        self._uses_baked_optical_depth = False
        self._lut_cache = OpticalDepthCache()
        self.clouds_rotation_speed = clouds_rotation_speed
        self.force_fullscreen = force_fullscreen
        self.sun = sun
        self.mode = MODE_FAR
        self.atmo_clip_distance = 0.0
        self.extra_cull_margin = planet_radius + atmosphere_height
        self._interior_lod_active = False
        if custom_shader is not None:
            self.set_custom_shader(custom_shader)
        for k, v in shader_params.items():
            self.set_shader_parameter(k if k.startswith("u_") else "u_" + k, v)

    # -- exported properties (planet_atmosphere.gd:20-54) --------------------

    @property
    def planet_radius(self) -> float:
        return float(self._params.planet_radius)

    @planet_radius.setter
    def planet_radius(self, value: float):
        value = max(float(value), 0.0)
        self._params = dataclasses.replace(
            self._params, planet_radius=jnp.float32(value))
        self._update_cull_margin()

    @property
    def atmosphere_height(self) -> float:
        return float(self._params.atmosphere_height)

    @atmosphere_height.setter
    def atmosphere_height(self, value: float):
        value = max(float(value), 0.0)
        self._params = dataclasses.replace(
            self._params, atmosphere_height=jnp.float32(value))
        self._update_cull_margin()

    def _update_cull_margin(self):
        self.extra_cull_margin = self.planet_radius + self.atmosphere_height

    def set_custom_shader(self, shader):
        """Variant switch; detects whether the variant consumes the baked LUT
        (``planet_atmosphere.gd:118-141`` scans uniforms for
        ``u_optical_depth_texture`` — all v2 variants declare it)."""
        if isinstance(shader, str):
            shader = VARIANTS[shader]
        self._config = shader
        self._uses_baked_optical_depth = (
            shader.model == "v2" and shader.od_mode == "lut")

    @property
    def custom_shader(self) -> VariantConfig:
        return self._config

    # -- shader parameter surface (planet_atmosphere.gd:175-218) -------------

    def set_shader_parameter(self, param_name: str, value):
        field = _UNIFORM_TO_FIELD.get(param_name)
        if field is None:
            raise KeyError(f"unknown shader parameter {param_name!r}")
        if param_name == "u_sun_position":
            self._sun_position_host = np.asarray(value, np.float32)
        if param_name in _COLOR_PARAMS:
            value = srgb_to_linear(np.asarray(value, np.float32)[:3])
        elif field in ("cloud_shape_texture", "cloud_coverage_cubemap",
                       "optical_depth_lut"):
            value = None if value is None else jnp.asarray(value, jnp.float32)
        else:
            value = jnp.asarray(value, jnp.float32)
        self._params = dataclasses.replace(self._params, **{field: value})

    # deprecated aliases (planet_atmosphere.gd:163-172)
    def set_shader_param(self, param_name: str, value):
        import warnings

        warnings.warn("set_shader_param is deprecated, use set_shader_parameter",
                      DeprecationWarning, stacklevel=2)
        self.set_shader_parameter(param_name, value)

    def get_shader_parameter(self, param_name: str):
        field = _UNIFORM_TO_FIELD.get(param_name)
        if field is None:
            raise KeyError(f"unknown shader parameter {param_name!r}")
        fs = self._params.frame_state
        if fs is not None:
            # the four per-frame dynamics live packed after update()
            if field == "sun_position":
                return fs[0:3]
            if field == "world_to_model":
                return fs[3:19].reshape(4, 4)
            if field == "cloud_coverage_rotation":
                return fs[19:23].reshape(2, 2)
            if field == "time":
                return fs[23]
        value = getattr(self._params, field)
        if param_name in _COLOR_PARAMS and value is not None:
            # mirror Godot's set/get round-trip: values go in and come out
            # as sRGB even though the renderer stores linear
            from ..utils.color import linear_to_srgb

            return linear_to_srgb(value)
        return value

    def get_shader_param(self, param_name: str):
        import warnings

        warnings.warn("get_shader_param is deprecated, use get_shader_parameter",
                      DeprecationWarning, stacklevel=2)
        return self.get_shader_parameter(param_name)

    def get_property_list(self):
        """User-facing ``shader_params/*`` names, like the inspector listing
        built by reflection at ``planet_atmosphere.gd:185-197``."""
        return [f"shader_params/{n}" for n in _UNIFORM_TO_FIELD
                if n not in _API_SHADER_PARAMS]

    def get_configuration_warnings(self):
        """(planet_atmosphere.gd:221-227)"""
        if self.sun is None:
            return ["The path to the sun is not assigned."]
        if not isinstance(self.sun, Node3D):
            return ["The assigned sun node is not a Node3D."]
        return []

    # -- per-frame update (planet_atmosphere.gd:285-341) ----------------------

    def update(self, time_s: float, camera: Optional[Camera] = None,
               cam_near: float = 0.1, cam_pos=None, origin=None):
        """Per-frame uniform refresh.  Host-side numpy only — a device
        readback here costs a full tunnel round-trip per frame on axon
        setups, which dwarfs the actual render time.  ``cam_pos`` lets the
        Scene fetch the camera transform once for all atmospheres.

        ``origin`` (float64 (3,)): large-world rebase — sun position and the
        world→model transform are expressed relative to it (in float64, cast
        f32 at pack), the TPU-native replacement for the reference's
        ``DOUBLE_PRECISION`` shader define
        (``planet_atmosphere_main.gdshaderinc:24-25``)."""
        if cam_pos is not None:
            cam_pos = np.asarray(cam_pos)
        elif camera is not None:
            cam_pos = np.asarray(camera.view_to_world)[:3, 3]
            cam_near = float(camera.near)
        else:
            cam_pos = self.position + np.array(
                [10.0 * (self.planet_radius + self.atmosphere_height + cam_near),
                 0.0, 0.0], np.float32)

        # 1.75 ≈ sqrt(3): cube far-mesh corner distance (:300-303)
        self.atmo_clip_distance = (1.75 * (self.planet_radius
                                           + self.atmosphere_height + cam_near)
                                   * SWITCH_MARGIN_RATIO)
        d = float(np.linalg.norm(self.position - cam_pos))
        is_near = d < self.atmo_clip_distance
        self.mode = MODE_NEAR if (is_near or self.force_fullscreen) else MODE_FAR

        # interior cloud-LOD policy (VariantConfig.cloud_lod_interior):
        # engage inside the shell, release at 1.1·(R+H) — the reference's
        # near/far hysteresis ratio, so the kernel swap can't flip-flop at
        # the boundary (each mode is its own compiled kernel)
        shell = self.planet_radius + self.atmosphere_height
        if self._interior_lod_active:
            self._interior_lod_active = d < shell * SWITCH_MARGIN_RATIO
        else:
            self._interior_lod_active = d < shell

        if self.sun is not None:
            sun_pos = np.asarray(self.sun.position)
            self._sun_position_host = sun_pos
        else:
            sun_pos = self._sun_position_host
        # rigid inverse in numpy (self.transform is host-side float64)
        r = self.transform[:3, :3]
        t = self.transform[:3, 3]
        if origin is not None:
            o = np.asarray(origin, np.float64)
            sun_pos = np.asarray(sun_pos, np.float64) - o
            t = t - o  # model = w2m·(p_rel + origin) ⇒ shift the translation
        w2m = np.eye(4)
        w2m[:3, :3] = r.T
        w2m[:3, 3] = -r.T @ t
        angle = time_s * math.radians(self.clouds_rotation_speed)
        c, s = math.cos(angle), math.sin(angle)
        # Transform2D().rotated(a) acts as [[c, -s], [s, c]] on xz (:338-341)
        rot = np.array([[c, -s], [s, c]], np.float32)
        # one packed upload per frame instead of four separate transfers;
        # kept as numpy so the transfer rides the next jit call instead of
        # costing its own eager dispatch
        fs = AtmosphereParams.pack_frame_state(sun_pos, w2m, rot, time_s)
        self._params = dataclasses.replace(self._params, frame_state=fs)

    # -- param building -------------------------------------------------------

    def build_params(self) -> AtmosphereParams:
        """Materialize the pytree, baking the LUT if this variant samples it."""
        params = self._params
        if self._uses_baked_optical_depth:
            lut = self._lut_cache.get(self.planet_radius, self.atmosphere_height,
                                      float(params.density))
            params = dataclasses.replace(params, optical_depth_lut=lut)
        return params

    @property
    def config(self) -> VariantConfig:
        return self._config

    def effective_config(self) -> VariantConfig:
        """The config the renderer compiles THIS frame: the user config
        with the camera-conditional interior cloud LOD applied
        (``cloud_lod_interior`` — the cost-scaling analog of the
        reference's near/far mesh swap, ``planet_atmosphere.gd:261-282``).
        ``config`` stays the user's setting; only ``Scene._sorted_layers``
        consumes this, so user round-trips through
        ``set_custom_shader(replace(a.config, ...))`` never bake the
        policy in."""
        c = self._config
        if (c.cloud_lod_interior and c.clouds_enabled
                and self._interior_lod_active):
            return dataclasses.replace(c, cloud_lod=c.cloud_lod_interior)
        return c


class Scene:
    """A renderable collection: atmospheres + opaque geometry + camera."""

    def __init__(self, atmospheres=(), opaque: Optional[OpaqueScene] = None,
                 large_world: Optional[bool] = None, environment=None):
        self.atmospheres = list(atmospheres)
        self.opaque = opaque
        #: optional ``render.glow.GlowSettings`` — the Godot Environment
        #: glow block (tscn import fills it; ``apply_environment`` uses it)
        self.environment = environment
        self._cam_pos_cache = {}
        #: Camera-relative rendering (the reference's DOUBLE_PRECISION analog,
        #: ``planet_atmosphere_main.gdshaderinc:24-25``): positions are
        #: rebased around the camera in host float64 each frame, so planets at
        #: e.g. Earth-scale coordinates (~6.4e6) render without f32
        #: quantization artifacts.  ``None`` = auto: on when the camera or any
        #: atmosphere sits beyond LARGE_WORLD_THRESHOLD from the world origin.
        self.large_world = large_world
        self._rebase_origin = None
        self._opaque_host_cache = {}
        self._tex_pyr_cache = {}

    def _large_world_active(self, cam_pos) -> bool:
        if self.large_world is not None:
            return self.large_world
        # camera distance counts even with no atmospheres: an opaque-only
        # scene at Earth-scale coordinates still marches with f32
        # quantization unless rebased (ADVICE r2)
        m = float(np.max(np.abs(cam_pos)))
        for a in self.atmospheres:
            m = max(m, float(np.max(np.abs(a.position))))
        return m > LARGE_WORLD_THRESHOLD

    def _cam_info(self, camera: Camera):
        """One device→host fetch per distinct camera object (a fetch per
        frame per atmosphere would serialize on tunnel round-trips).

        The cache value keeps a reference to the keyed array: ``id()`` keys
        are only stable while the object is alive, so holding it prevents a
        recycled id from serving a stale position."""
        arr = camera.view_to_world
        key = id(arr)
        entry = self._cam_pos_cache.get(key)
        if entry is None:
            entry = (arr, np.asarray(arr)[:3, 3], float(camera.near))
            self._cam_pos_cache = {key: entry}
        return entry[1], entry[2]

    def update(self, time_s: float, camera: Camera):
        cam_pos, cam_near = self._cam_info(camera)
        origin = None
        if self._large_world_active(cam_pos):
            origin = np.asarray(cam_pos, np.float64)
        self._rebase_origin = origin
        self._last_update_time = time_s
        for atmo in self.atmospheres:
            atmo.update(time_s, camera, cam_pos=cam_pos, cam_near=cam_near,
                        origin=origin)

    def render(self, camera: Camera, height: int, width: int,
               renderer: str = "auto"):
        """Sort atmospheres far→near (Godot's transparent-pass sorting) and
        render one frame.

        ``renderer``: ``"pallas"`` (fused megakernel — fastest),
        ``"xla"`` (whole-frame fused jit), or ``"auto"`` which picks the
        megakernel on TPU whenever the scene is eligible (analytic optical
        depth, procedural cloud fields).  Both return ``color`` (H, W, 3)
        and ``alpha`` (max over atmosphere layers); the XLA path adds the
        nonlinear ``depth`` buffer, the pallas path ``linear_depth`` when a
        chained pass produced it.
        """
        # sync frame_states to the rebase origin first (build_params snapshots
        # them), sort with the absolute camera, then swap in the
        # camera-relative view of the world for the device
        self._sync_rebase(camera)
        order, params, configs = self._sorted_layers(camera)
        camera, opaque = self._rebased_view(camera)

        if renderer != "xla":
            plan = self._pallas_plan(params, configs)
            pano = self._pano_plan() if plan is not None else None
            if (plan is not None and pano is None and self.opaque is not None
                    and getattr(self.opaque, "panorama", None) is not None):
                plan = None  # unpackable panorama: XLA samples it exactly
            if plan is not None:
                from ..ops.pallas.megakernel import render_scene_pallas

                aug_configs, tex_data = plan
                order, params, aug_configs, tex_data, bands, band_rows = (
                    self._layer_bands(order, params, aug_configs, tex_data,
                                      camera, height))
                # the whole far→near chain (opaque fuse + every atmosphere
                # layer) traces into ONE jit = one device dispatch per frame
                return render_scene_pallas(params, aug_configs, camera,
                                           opaque, height, width,
                                           tex_data=tex_data, bands=bands,
                                           band_rows=band_rows,
                                           pano_data=None if pano is None
                                           else pano[0],
                                           pano_meta=None if pano is None
                                           else pano[1])
            if renderer == "pallas":
                raise ValueError(
                    "pallas renderer needs analytic optical depth and "
                    "procedural or pyramid-compatible cloud fields "
                    "(and a TPU backend)")
        return render_frame(params, configs, camera, opaque, height, width)

    def apply_environment(self, color):
        """Post-process a rendered linear frame with the scene's Environment
        settings (glow today; the demo env's HDR bloom around the sun).
        No-op when the scene carries no environment."""
        if self.environment is None or not self.environment.enabled:
            return color
        from ..render.glow import apply_glow

        return apply_glow(color, self.environment)

    def _sync_rebase(self, camera: Camera):
        """Make the packed frame_states camera-relative when large-world mode
        is on and the rebase origin is stale (camera moved since ``update``,
        or ``update`` was never called on this static scene)."""
        cam_pos, _ = self._cam_info(camera)
        if not self._large_world_active(cam_pos):
            self._rebase_origin = None
            return
        origin = self._rebase_origin
        if origin is None or not np.array_equal(
                origin, np.asarray(cam_pos, np.float64)):
            self.update(getattr(self, "_last_update_time", 0.0), camera)

    def _rebased_view(self, camera: Camera):
        """The (camera, opaque) pair the device should see.  When large-world
        mode is active, every world position crossing to the device is
        camera-relative — subtracted in host float64, cast f32 — so
        Earth-scale coordinates carry no f32 quantization into the march
        (the reference's DOUBLE_PRECISION analog)."""
        origin = self._rebase_origin
        if origin is None:
            return camera, self.opaque
        m = np.array(np.asarray(camera.view_to_world), np.float64)
        m[:3, 3] -= origin
        cam_rel = dataclasses.replace(
            camera, view_to_world=m.astype(np.float32))
        opaque = (self.opaque.rebased(origin, self._opaque_host_cache)
                  if self.opaque is not None else None)
        return cam_rel, opaque

    def _layer_bands(self, order, params, configs, tex_data, camera, height):
        """Far-LOD banding plan: per layer, the screen-row band its shell can
        touch (``render/lod.py``).  The reference shrinks the shaded pixel
        set with a far cube mesh (``planet_atmosphere.gd:261-321``); here
        far-mode layers launch their kernel over only the projected rows.
        Layers whose shell is entirely behind the camera are dropped from
        the chain outright (every ray misses — the analog of frustum
        culling the cube mesh).  Near-mode (or ``force_fullscreen``) layers
        stay fullscreen, exactly like the reference's fullscreen quad.

        All inputs are host-side (node transforms, the cull margin the
        setters maintain, the rebased camera's numpy matrix) — a device
        fetch here would cost a tunnel round-trip per layer per frame."""
        from ..render.lod import EMPTY, layer_band

        # np.asarray/float on jax arrays reuse the cached host copy after
        # the first fetch; the rebased camera is numpy-backed outright
        v2w = np.asarray(camera.view_to_world, np.float64)
        fov = float(camera.fov_y_rad)
        origin = self._rebase_origin
        keep, bands, rows = [], [], []
        any_band = False
        for i, atmo in enumerate(order):
            center = np.asarray(atmo.position, np.float64)
            if origin is not None:
                center = center - origin
            band = layer_band(atmo.mode, v2w, fov, height, center,
                              atmo.extra_cull_margin, 0.0,
                              mode_far=MODE_FAR)
            if band == EMPTY:
                continue  # shell behind the camera: drop the layer
            keep.append(i)
            if band is None:
                bands.append(None)
                rows.append(0)
            else:
                bands.append(band[1])
                rows.append(band[0])
                any_band = True
        if not keep:
            # every layer culled: render the nearest layer fullscreen (it
            # will shade nothing — keeps the "≥1 layer" kernel structure)
            keep, bands, rows, any_band = [len(order) - 1], [None], [0], False
        sel = lambda seq: tuple(seq[i] for i in keep)  # noqa: E731
        if not any_band:
            return (sel(order), sel(params), sel(configs),
                    None if tex_data is None else sel(tex_data), None, None)
        return (sel(order), sel(params), sel(configs),
                None if tex_data is None else sel(tex_data),
                tuple(bands), np.asarray(rows, np.int32))

    def _sorted_layers(self, camera: Camera):
        cam_pos, _ = self._cam_info(camera)
        order = sorted(self.atmospheres,
                       key=lambda a: -float(np.linalg.norm(a.position - cam_pos)))
        return (order, tuple(a.build_params() for a in order),
                tuple(a.effective_config() for a in order))

    @staticmethod
    def _pallas_eligible(configs) -> bool:
        import jax

        return (jax.default_backend() == "tpu" and len(configs) >= 1
                and all(c.od_mode == "analytic"
                        and (not c.clouds_enabled
                             or (c.cloud_shape_noise is not None
                                 and c.cloud_coverage_noise is not None))
                        for c in configs))

    def _tex_pyramid(self, t, kind):
        """Packed VMEM mip pyramid for a baked texture (cached by object —
        one host fetch + pack per texture, like the camera-position cache).
        Returns (data, meta) or None if the texture can't ride the kernel
        (non-power-of-two, oversize — the XLA path still handles those)."""
        if t is None:
            return None
        key = (id(t), kind)
        hit = self._tex_pyr_cache.get(key)
        if hit is not None and hit[0] is t:
            return hit[1]
        from ..ops.pallas.texsample import (build_latlong_pyramid,
                                            build_tex3d_pyramid)

        try:
            if kind == "tex3d":
                data, meta = build_tex3d_pyramid(np.asarray(t))
            else:
                data, meta = build_latlong_pyramid(np.asarray(t))
            # device-resident ONCE: leaving the pyramid as host numpy would
            # re-upload ~1-2 MiB through the tunnel on every frame (measured
            # as a ~10-20 ms/frame constant on axon setups)
            built = (jnp.asarray(data), meta)
        except ValueError:
            built = None
        self._tex_pyr_cache[key] = (t, built)
        return built

    def _pano_plan(self):
        """Panorama-sky pyramid triple for the megakernel (cached by texture
        object like :meth:`_tex_pyramid`).  Returns ``(pano_data, meta)`` or
        ``None`` when there is no panorama or it can't ride the kernel (the
        XLA path samples the raw equirect exactly in that case)."""
        opq = self.opaque
        t = getattr(opq, "panorama", None) if opq is not None else None
        if t is None:
            return None
        key = (id(t), "equirect")
        hit = self._tex_pyr_cache.get(key)
        if hit is not None and hit[0] is t:
            return hit[1]
        from ..ops.pallas.texsample import build_equirect_pyramid

        try:
            arr = np.asarray(t)
            # pyramid width: the power of two nearest the source width from
            # below (no invented detail), clamped to the sampler's range
            w = 1 << int(np.log2(min(2048, max(64, arr.shape[1]))))
            datas, meta = build_equirect_pyramid(arr, width=w)
            built = (tuple(jnp.asarray(d) for d in datas), meta)
        except ValueError:
            built = None
        self._tex_pyr_cache[key] = (t, built)
        return built

    def _pallas_plan(self, params, configs):
        """Megakernel eligibility + texture plumbing.

        Returns ``(aug_configs, tex_data)`` — configs augmented with static
        pyramid metas (in-kernel texture mode, VERDICT r1 missing #5 /
        ROADMAP r1 #3) and the per-layer pyramid arrays — or ``None`` when
        the scene must take the XLA path."""
        import jax

        if jax.default_backend() != "tpu" or not configs:
            return None
        aug, tex = [], []
        for p, c in zip(params, configs):
            if c.od_mode != "analytic":
                return None
            if not c.clouds_enabled:
                aug.append(c)
                tex.append(None)
                continue
            entry = []
            newc = c
            if c.cloud_shape_noise is None and c.cloud_shape_tex_meta is None:
                built = self._tex_pyramid(p.cloud_shape_texture, "tex3d")
                if built is None:
                    return None
                newc = dataclasses.replace(
                    newc, cloud_shape_tex_meta=built[1],
                    cloud_shape_interp=True)
                entry.append(built[0])
            if (c.cloud_coverage_noise is None
                    and c.cloud_coverage_tex_meta is None):
                built = self._tex_pyramid(p.cloud_coverage_cubemap, "latlong")
                if built is None:
                    return None
                newc = dataclasses.replace(
                    newc, cloud_coverage_tex_meta=built[1],
                    cloud_coverage_interp=True)
                entry.append(built[0])
            aug.append(newc)
            tex.append(tuple(entry) if entry else None)
        return tuple(aug), tuple(tex)

    def render_flight(self, camera: Camera, times, height: int, width: int,
                      cam_transforms=None, renderer: str = "auto",
                      interpret: bool = False, taa_blend=None,
                      taa_depth_eps: float = 0.2,
                      taa_clamp: str = "minmax",
                      taa_clamp_gamma: float = 1.25,
                      mesh=None, taa_halo="auto"):
        """Render K frames in ONE device dispatch (in-graph ``lax.map``).

        The animation/flight-path fast mode: per-frame host dispatch
        overhead — which dominates frame time at small resolutions — is
        paid once for the whole sequence, like replaying a pre-recorded
        command buffer.  ``times`` is a (K,) sequence of scene times;
        ``cam_transforms`` an optional (K, 4, 4) stack of per-frame camera
        ``view_to_world`` transforms (a fly path).  Returns
        ``color (K, H, W, 3)`` and ``alpha (K, H, W)``.

        ``mesh`` (with ``taa_blend``): row-shard the TAA flight over a
        device mesh — TAA reprojection is the one cross-chip communication
        in the design; each shard exchanges ``taa_halo`` boundary history
        rows with its neighbors per frame over ICI
        (``parallel/sharding.py::render_flight_taa_sharded``).
        ``taa_halo="auto"`` (default) sizes the halo from the flight's
        actual camera motion and scene depth; an explicit int is validated
        against the same bound and warns (``TaaHaloWarning``) when the
        motion exceeds it.
        """
        if mesh is not None and taa_blend is None:
            # the only sharded flight is the TAA one (render_flight_taa_sharded);
            # silently dropping to a single-device render would misreport a
            # multi-chip request (ADVICE r4)
            raise ValueError(
                "mesh is only honored with taa_blend (the sharded TAA "
                "flight); for a sharded non-TAA frame use "
                "parallel.sharding.render_scene_pallas_sharded per frame")
        times = np.asarray(times, np.float32)
        cam_pos, cam_near = self._cam_info(camera)  # ONE device fetch
        order, params, configs = self._sorted_layers(camera)
        # large-world flights rebase the WHOLE sequence by one origin (the
        # first frame's camera) — one origin keeps the opaque scene and the
        # jitted graph static across the in-graph lax.map; precision holds
        # because a flight segment spans km, not the 1e6+ world coordinate
        origin = None
        if self._large_world_active(cam_pos):
            origin = np.asarray(
                np.asarray(cam_transforms[0], np.float64)[:3, 3]
                if cam_transforms is not None else cam_pos, np.float64)
        self._rebase_origin = origin
        # per-frame packed state per layer, built host-side in one numpy pass
        fs_stacks = []
        for atmo in order:
            rows = []
            for i, t in enumerate(times):
                cp = (np.asarray(cam_transforms[i], np.float64)[:3, 3]
                      if cam_transforms is not None else cam_pos)
                atmo.update(float(t), cam_near=cam_near, cam_pos=cp,
                            origin=origin)
                rows.append(np.asarray(atmo._params.frame_state))
            fs_stacks.append(np.stack(rows))
        params = tuple(dataclasses.replace(p, frame_state=None) for p in params)

        camera, opaque = self._rebased_view(camera)
        if origin is not None and cam_transforms is not None:
            cam_transforms = np.asarray(cam_transforms, np.float64).copy()
            cam_transforms[:, :3, 3] -= origin
            cam_transforms = cam_transforms.astype(np.float32)

        plan = self._pallas_plan(params, configs)
        if interpret and plan is None:
            plan = (configs, (None,) * len(configs))
        pano = self._pano_plan() if plan is not None else None
        if (plan is not None and pano is None and self.opaque is not None
                and getattr(self.opaque, "panorama", None) is not None
                and not interpret):
            plan = None  # unpackable panorama: XLA samples it exactly
        pd, pm = (pano if pano is not None else (None, None))
        if renderer != "xla" and plan is not None:
            aug_configs, tex_data = plan
            if taa_blend is not None and mesh is not None:
                # multi-chip TAA flight: row bands + per-frame halo
                # exchange of boundary history rows (VERDICT r3 #3)
                from ..parallel.sharding import render_flight_taa_sharded

                return render_flight_taa_sharded(
                    params, tuple(fs_stacks), aug_configs, camera, opaque,
                    height, width, mesh, cam_stack=cam_transforms,
                    blend=float(taa_blend), halo=taa_halo,
                    interpret=interpret, tex_data=tex_data,
                    pano_data=pd, pano_meta=pm,
                    depth_eps=float(taa_depth_eps), clamp_mode=taa_clamp,
                    clamp_gamma=float(taa_clamp_gamma))
            if taa_blend is not None:
                # temporally-accumulated flight (ops/pallas/taa.py) — a
                # capability the reference engine lacks (no reprojection)
                from ..ops.pallas.megakernel import render_flight_taa

                return render_flight_taa(params, tuple(fs_stacks),
                                         aug_configs, camera, opaque,
                                         height, width,
                                         cam_stack=cam_transforms,
                                         blend=float(taa_blend),
                                         interpret=interpret,
                                         tex_data=tex_data,
                                         pano_data=pd, pano_meta=pm,
                                         depth_eps=float(taa_depth_eps),
                                         clamp_mode=taa_clamp,
                                         clamp_gamma=float(taa_clamp_gamma))
            from ..ops.pallas.megakernel import render_flight_pallas

            return render_flight_pallas(params, tuple(fs_stacks), aug_configs,
                                        camera, opaque, height, width,
                                        cam_stack=cam_transforms,
                                        interpret=interpret,
                                        tex_data=tex_data,
                                        pano_data=pd, pano_meta=pm)
        if taa_blend is not None:
            raise ValueError("taa_blend needs the pallas flight path "
                             "(TPU backend or interpret=True)")
        if renderer == "pallas":
            raise ValueError(
                "pallas renderer needs analytic optical depth and "
                "procedural cloud fields (and a TPU backend)")
        from ..render.renderer import render_flight_xla

        return render_flight_xla(params, tuple(fs_stacks), configs, camera,
                                 opaque, height, width,
                                 cam_stack=cam_transforms)
