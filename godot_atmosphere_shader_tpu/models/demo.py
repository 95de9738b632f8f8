"""The golden demo scene.

Reproduces ``/root/reference/addons/zylann.atmosphere/demo/planet_atmosphere_test.tscn``
— planet R=100 with atmosphere H=8 and clouds, sun sphere + directional light
at z≈598.7, moon, tumbling box, flying-avatar start pose — which is the
reference's only integration fixture (``SURVEY.md §4``) and the scene our
benchmark configs replicate.

Two field modes:

* ``procedural=True`` (default, the TPU fast path): cloud coverage and shape
  are evaluated as noise in-kernel with specs mirroring the demo's
  FastNoiseLite resources (coverage: domain-warped noise at NoiseCubemap
  scale (100, 200, 100); shape: ridged 8-octave fractal as NoiseTexture3D).
* ``procedural=False``: the same specs are *baked* into a coverage cubemap
  and a 64³ shape texture which the renderer then samples — the reference's
  actual texture pipeline, used for parity testing.
"""

from __future__ import annotations

import numpy as np

from ..ops.noise import NoiseSpec
from ..render.opaque import OpaqueScene
from ..utils.camera import Camera, look_at
from ..utils.color import srgb_to_linear
from .params import ProceduralField, VariantConfig, VARIANTS
from .scene import Node3D, PlanetAtmosphere, Scene

#: demo NoiseTexture3D source (planet_atmosphere_test.tscn:48-57):
#: FastNoiseLite type 2 (cellular), freq 0.1, fractal type 2 (ridged),
#: 8 octaves, gain 0.665.  Exact 27-cell cellular is bake-only; the
#: in-march specs below trade basis fidelity for step cost (measured
#: deltas in tests/test_shape_field.py, SURVEY.md §7 hard part (c)).
SHAPE_NOISE_BAKE = NoiseSpec(noise_type="cellular", frequency=0.1,
                             fractal_type="ridged", octaves=8, gain=0.665,
                             cellular_return="distance", seed=3)
#: Fast-path spec: value-noise basis, 3 octaves.  At the march's sampling
#: rate (64 steps over the clamped ~15-unit segment) octaves ≥2 alias anyway.
#: Measured render delta vs the baked cellular-ridged-8oct reference texture
#: (144×216, exact coverage, tests/test_shape_field.py): mean |Δ| 0.0133
#: avatar / 0.0025 interior.
SHAPE_NOISE_FAST = NoiseSpec(noise_type="value", frequency=0.1,
                             fractal_type="ridged", octaves=3, gain=0.665,
                             seed=3)
#: Higher-fidelity in-march spec: true cellular basis via the 8-cell Worley
#: F1 window (``ops/noise.py::cellular_noise3_fast`` — identical feature
#: points to the bake's 27-cell field, ~3.4× cheaper per eval).  Measured
#: render delta vs the baked reference: mean |Δ| 0.0110 avatar / 0.0022
#: interior — closer than the value basis, at ~2× its march cost
#: (flagship 209 → ~108 Mrays/s), so it is the opt-in quality tier.
SHAPE_NOISE_FAST_CELL = NoiseSpec(noise_type="cellular_fast", frequency=0.1,
                                  fractal_type="ridged", octaves=3,
                                  gain=0.665, cellular_return="distance",
                                  seed=3)

#: demo NoiseCubemap source (planet_atmosphere_test.tscn:59-69):
#: default FastNoiseLite with domain warp (amp 90, freq 0.01, 3 octaves),
#: cubemap scale (100, 200, 100).
#: The demo resource only overrides the warp parameters, so it keeps Godot's
#: default FBM fractal (5 octaves) on the base noise.
COVERAGE_NOISE = NoiseSpec(noise_type="simplex_smooth", frequency=0.01,
                           fractal_type="fbm", octaves=5,
                           warp_enabled=True, warp_amplitude=90.0,
                           warp_frequency=0.01, warp_octaves=3, seed=11)
COVERAGE_SCALE = (100.0, 200.0, 100.0)
COVERAGE_RESOLUTION = 256

#: NoiseTexture3D default size is 64³; one texture period per texcoord unit.
SHAPE_TEXTURE_SIZE = 64


def demo_variant(name: str = "clouds", procedural: bool = True,
                 shape_basis: str = "value") -> VariantConfig:
    """The demo's shader variant with its cloud field specs attached.

    ``shape_basis``: ``"value"`` (default fast spec) or ``"cellular"``
    (8-cell Worley F1, closer to the baked cellular-ridged reference at
    ~2× the march cost — see SHAPE_NOISE_FAST_CELL).
    """
    import dataclasses

    cfg = VARIANTS[name]
    if not cfg.clouds_enabled:
        return cfg
    if not procedural:
        # texture mode gets the same measured fast profile as procedural
        # (without it the texture kernel marched at full resolution while
        # procedural ran the lod-2 profile — measured 2.5x of the gap
        # between the two modes)
        return dataclasses.replace(
            cfg,
            cloud_coverage_interp=True,
            cloud_coverage_knots=8,
            cloud_coverage_lod=2,
            cloud_lod=2,
            # in-shell poses raise the vertical LOD to 4 (measured bounds
            # in VariantConfig.cloud_lod_interior's docstring)
            cloud_lod_interior=4,
            # dynamic 2-knot VMEM indexing instead of the K+1-term hat sum
            # (ROADMAP #13): measured 237.8 → 255.7 Mrays/s on the texture
            # flagship (the march interpolates cov+shape+detail knots);
            # float-rounding-identical (tests/test_knot_dynamic.py)
            knot_dynamic=True,
        )
    shape = {"value": SHAPE_NOISE_FAST,
             "cellular": SHAPE_NOISE_FAST_CELL}[shape_basis]
    return dataclasses.replace(
        cfg,
        cloud_shape_noise=ProceduralField(
            noise=shape,
            scale=(float(SHAPE_TEXTURE_SIZE),) * 3),
        cloud_coverage_noise=ProceduralField(
            noise=COVERAGE_NOISE, scale=COVERAGE_SCALE),
        # measured fast-path profile (tests/test_coverage_interp.py,
        # tests/test_cloud_lod.py): 8-knot piecewise coverage matches the
        # reference's baked-cubemap pipeline as closely as exact per-step
        # evaluation does (avatar-pose mean |Δ| 0.0116 vs 0.0117), and the
        # vertical cloud/coverage LODs sit well below that error scale
        cloud_coverage_interp=True,
        cloud_coverage_knots=8,
        cloud_coverage_lod=2,
        cloud_lod=2,
        # camera inside the shell → vertical LOD 4: measured 1080p interior
        # 13.10 → 10.55 ms (158 → 197 Mrays/s) at mean |Δ| 0.0012 vs the
        # full-res march (the shipped lod-2 default measures 0.00087); the
        # 1.1-hysteresis engage/release logic lives in
        # PlanetAtmosphere.update / effective_config
        cloud_lod_interior=4,
        # measured 196.0 → 199.2 Mrays/s procedural (coverage knots only);
        # see ROADMAP #13 / tests/test_knot_dynamic.py
        knot_dynamic=True,
    )


def build_demo_scene(variant: str = "clouds", procedural: bool = True,
                     shape_basis: str = "value") -> Scene:
    """Planet + sun + moon + cube demo scene (tscn node-for-node)."""
    sun = Node3D(position=(0.0, 0.0, 598.677), name="Sun")

    atmo = PlanetAtmosphere(
        planet_radius=100.0,
        atmosphere_height=8.0,
        sun=sun,
        custom_shader=demo_variant(variant, procedural, shape_basis),
        name="PlanetAthmosphere",  # sic, as in the tscn
    )
    # shader_params block (planet_atmosphere_test.tscn:101-114)
    atmo.set_shader_parameter("u_density", 0.5)
    atmo.set_shader_parameter("u_scattering_strength", 1.0)
    atmo.set_shader_parameter("u_atmosphere_modulate", (1.0, 0.980392, 0.964706))
    atmo.set_shader_parameter("u_atmosphere_ambient_color",
                              (0.0196078, 0.0196078, 0.0431373))
    atmo.set_shader_parameter("u_cloud_density_scale", 2.0)
    atmo.set_shader_parameter("u_cloud_bottom", 0.2)
    atmo.set_shader_parameter("u_cloud_top", 0.6)
    atmo.set_shader_parameter("u_cloud_blend", 0.5)
    atmo.set_shader_parameter("u_cloud_shape_invert", 1.0)
    atmo.set_shader_parameter("u_cloud_coverage_bias", 0.0)
    atmo.set_shader_parameter("u_cloud_shape_factor", 0.5)
    atmo.set_shader_parameter("u_cloud_shape_scale", 0.1)

    if not procedural and atmo.config.clouds_enabled:
        from ..ops.sampling import bake_noise_cubemap, bake_noise_texture3d

        atmo.set_shader_parameter(
            "u_cloud_shape_texture",
            bake_noise_texture3d(SHAPE_NOISE_BAKE, SHAPE_TEXTURE_SIZE))
        atmo.set_shader_parameter(
            "u_cloud_coverage_cubemap",
            bake_noise_cubemap(COVERAGE_NOISE, COVERAGE_SCALE,
                               COVERAGE_RESOLUTION))

    # opaque geometry (planet_atmosphere_test.tscn:78-125)
    ground_albedo = tuple(np.asarray(
        srgb_to_linear(np.array([0.27451, 0.364706, 0.431373], np.float32))))
    box_transform_world = np.array([
        [0.737148, 2.23517e-08, -0.675732, 74.2016],
        [0.662773, 0.194902, 0.723011, 13.2348],
        [0.131701, -0.980823, 0.143672, 80.2044],
        [0.0, 0.0, 0.0, 1.0],
    ], np.float32)
    # world→box: rigid inverse
    r = box_transform_world[:3, :3]
    t = box_transform_world[:3, 3]
    w2b = np.eye(4, dtype=np.float32)
    w2b[:3, :3] = r.T
    w2b[:3, 3] = -r.T @ t

    opaque = OpaqueScene.create(
        spheres=[
            ((0.0, 0.0, 0.0), 100.0, ground_albedo),  # Ground
            ((0.0, 0.0, 598.677), 20.0, (4.0, 4.0, 4.0), 1.0),  # Sun (unshaded)
            ((-188.991, 0.0, 192.584), 10.0, (0.6, 0.6, 0.6)),  # Moon
        ],
        boxes=[(w2b, (5.0, 15.0, 5.0), (0.7, 0.7, 0.7))],
        # DirectionalLight under the sun, aimed at the planet (-Z toward origin)
        light_dir=(0.0, 0.0, -1.0),
        ambient=0.02,
        sky_color=(0.001, 0.001, 0.002),
        # procedural starfield standing in for the demo's space panorama
        star_intensity=1.0,
    )

    return Scene(atmospheres=[atmo], opaque=opaque)


def build_gas_giant_scene() -> Scene:
    """The gas-giant tier scene (``PROFILES['gas_giant']``, 64 atmo steps).

    The reference anticipates this regime in-source
    (``atmosphere_funcs_v2.gdshaderinc:42-43``: gas giants want ~64 steps)
    but ships no scene for it; this builder provides the measured fixture:
    R/H = 40 (R=1000, H=25) with ``u_density = 2.0`` — optically THICK
    (grazing full-traversal chords reach OD ≈ 8000, transmittance ≈ 0),
    which is what makes the 8-step rocky march visibly diverge (max 0.26
    vs converged; 64 steps reach 0.035 — GAS_GIANT_STUDY.json).  The
    opaque R=1000 sphere stands in for the optically-solid deck below the
    shell.  No clouds: the cloud layer is a rocky-demo feature; the
    gas-giant tier stresses the atmosphere integrator.
    """
    from .params import PROFILES

    sun = Node3D(position=(0.0, 0.0, 5986.77), name="Sun")
    atmo = PlanetAtmosphere(
        planet_radius=1000.0,
        atmosphere_height=25.0,
        sun=sun,
        custom_shader=PROFILES["gas_giant"],
        name="GasGiant",
    )
    atmo.set_shader_parameter("u_density", 2.0)
    atmo.set_shader_parameter("u_scattering_strength", 1.0)
    atmo.set_shader_parameter("u_atmosphere_modulate", (1.0, 0.95, 0.85))
    atmo.set_shader_parameter("u_atmosphere_ambient_color",
                              (0.02, 0.015, 0.01))

    deck_albedo = tuple(np.asarray(
        srgb_to_linear(np.array([0.76, 0.64, 0.47], np.float32))))
    opaque = OpaqueScene.create(
        spheres=[
            ((0.0, 0.0, 0.0), 1000.0, deck_albedo),  # opaque deck
            ((0.0, 0.0, 5986.77), 200.0, (4.0, 4.0, 4.0), 1.0),  # sun
        ],
        light_dir=(0.0, 0.0, -1.0),
        ambient=0.02,
        sky_color=(0.001, 0.001, 0.002),
        star_intensity=1.0,
    )
    return Scene(atmospheres=[atmo], opaque=opaque)


def gas_giant_camera(pose: str = "limb", height: int = 1080,
                     width: int = 1920) -> Camera:
    """Named poses for the gas-giant scene (10× the rocky demo's scale).

    ``limb`` is the tier's stress pose: every ray through the shell is a
    full-traversal optically-thick chord (the geometry the 64-step
    guidance exists for)."""
    if pose == "limb":
        return Camera.create(look_at((0.0, 0.0, 3000.0), (0.0, 1012.0, 0.0)),
                             fov_y_deg=70.0, near=1.0, far=8000.0)
    if pose == "exterior":
        return Camera.create(look_at((1800.0, 600.0, 1800.0), (0.0, 0.0, 0.0)),
                             fov_y_deg=70.0, near=1.0, far=8000.0)
    if pose == "interior":  # inside the shell, grazing the horizon
        eye = (0.0, 1020.0, 0.0)
        return Camera.create(look_at(eye, (1000.0, 1012.0, 0.0)),
                             fov_y_deg=70.0, near=1.0, far=8000.0)
    if pose == "space":
        return Camera.create(look_at((0.0, 1500.0, 4200.0), (0.0, 0.0, 0.0)),
                             fov_y_deg=70.0, near=1.0, far=8000.0)
    raise ValueError(f"unknown gas-giant pose {pose!r}")


def default_node_scene() -> Scene:
    """The drag-and-drop default node scene
    (``/root/reference/addons/zylann.atmosphere/planet_atmosphere.tscn:8-15``):
    R=1, H=0.2, the built-in v2 no-clouds shader, density 10, strength 0.5."""
    atmo = PlanetAtmosphere(planet_radius=1.0, atmosphere_height=0.2,
                            custom_shader="no_clouds")
    atmo.set_shader_parameter("u_density", 10.0)
    atmo.set_shader_parameter("u_scattering_strength", 0.5)
    return Scene(atmospheres=[atmo])


def demo_camera(pose: str = "avatar", height: int = 1080, width: int = 1920) -> Camera:
    """Named camera poses for the benchmark configs (BASELINE.json)."""
    if pose == "avatar":  # flying-avatar start (tscn:116-117)
        return Camera.create(look_at((0.0, 0.0, 156.425), (0.0, 0.0, 0.0)),
                             fov_y_deg=70.0, near=0.1, far=800.0)
    if pose == "exterior":
        return Camera.create(look_at((180.0, 60.0, 180.0), (0.0, 0.0, 0.0)),
                             fov_y_deg=70.0, near=0.1, far=800.0)
    if pose == "interior":  # inside the atmosphere, looking at the horizon
        eye = (0.0, 104.0, 0.0)
        return Camera.create(look_at(eye, (100.0, 100.0, 0.0)),
                             fov_y_deg=70.0, near=0.1, far=800.0)
    if pose == "space":
        return Camera.create(look_at((0.0, 150.0, 420.0), (0.0, 0.0, 0.0)),
                             fov_y_deg=70.0, near=0.1, far=800.0)
    if pose == "sunrise":
        # on the planet's surface looking at the sun through the atmosphere
        # limb (the atmosphere's 0.99 alpha cap dims the HDR disk — the
        # classic horizon shot, little glow by design)
        return Camera.create(look_at((0.0, 103.0, 0.0),
                                     (0.0, 30.0, 598.677)),
                             fov_y_deg=70.0, near=0.1, far=800.0)
    if pose == "sunward":
        # in space facing the HDR sun mesh (albedo (4,4,4) unshaded,
        # tscn:10-16) with the planet limb below — the direct sun ray
        # clears the atmosphere, so this is the pose that shows the
        # Environment glow bloom
        return Camera.create(look_at((0.0, 130.0, 300.0),
                                     (0.0, 0.0, 598.677)),
                             fov_y_deg=70.0, near=0.1, far=800.0)
    raise ValueError(f"unknown pose {pose!r}")
