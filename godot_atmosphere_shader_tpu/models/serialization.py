"""Scene serialization: the ``.tscn`` tier of the reference's config system.

The reference persists scenes as ``.tscn`` files whose ``shader_params/*``
keys override shader defaults (``demo/planet_atmosphere_test.tscn:96-114``,
``SURVEY.md §5 config`` tier 3).  Here a scene round-trips through a plain
JSON-able dict with the same ``shader_params/u_*`` naming, so saved scenes
are diffable and the parameter surface stays reference-shaped.
"""

from __future__ import annotations

import dataclasses
import json
import numpy as np

from ..ops.noise import NoiseSpec
from .params import ProceduralField, VariantConfig
from .scene import Node3D, PlanetAtmosphere, Scene, _UNIFORM_TO_FIELD, _API_SHADER_PARAMS


def _variant_to_dict(cfg: VariantConfig) -> dict:
    d = dataclasses.asdict(cfg)
    for key in ("cloud_shape_noise", "cloud_coverage_noise"):
        if d[key] is not None:
            d[key] = {"noise": dataclasses.asdict(cfg.__getattribute__(key).noise),
                      "scale": list(cfg.__getattribute__(key).scale)}
    return d


def _variant_from_dict(d: dict) -> VariantConfig:
    d = dict(d)
    for key in ("cloud_shape_noise", "cloud_coverage_noise"):
        if d.get(key) is not None:
            d[key] = ProceduralField(noise=NoiseSpec(**d[key]["noise"]),
                                     scale=tuple(d[key]["scale"]))
    return VariantConfig(**d)


def atmosphere_to_dict(atmo: PlanetAtmosphere) -> dict:
    """Serialize one node: exported properties + non-default shader params."""
    out = {
        "planet_radius": atmo.planet_radius,
        "atmosphere_height": atmo.atmosphere_height,
        "clouds_rotation_speed": atmo.clouds_rotation_speed,
        "force_fullscreen": atmo.force_fullscreen,
        "transform": np.asarray(atmo.transform).tolist(),
        "custom_shader": _variant_to_dict(atmo.config),
        "shader_params": {},
    }
    for uname, field in _UNIFORM_TO_FIELD.items():
        if uname in _API_SHADER_PARAMS:
            continue
        if field in ("cloud_shape_texture", "cloud_coverage_cubemap",
                     "optical_depth_lut"):
            continue  # textures are never serialized (noise_cubemap.gd:84-90)
        v = atmo.get_shader_parameter(uname)
        arr = np.asarray(v)
        out["shader_params"][uname] = (arr.tolist() if arr.ndim else float(arr))
    if atmo.sun is not None:
        out["sun_position"] = np.asarray(atmo.sun.position).tolist()
    return out


def atmosphere_from_dict(d: dict) -> PlanetAtmosphere:
    sun = None
    if "sun_position" in d:
        sun = Node3D(position=tuple(d["sun_position"]), name="Sun")
    atmo = PlanetAtmosphere(
        planet_radius=d["planet_radius"],
        atmosphere_height=d["atmosphere_height"],
        sun=sun,
        custom_shader=_variant_from_dict(d["custom_shader"]),
        clouds_rotation_speed=d.get("clouds_rotation_speed", 1.0),
        force_fullscreen=d.get("force_fullscreen", False),
        transform=np.asarray(d["transform"], np.float32),
    )
    for uname, value in d.get("shader_params", {}).items():
        # set_shader_parameter applies the same sRGB→linear conversion the
        # values were serialized with (get returns sRGB for color params)
        atmo.set_shader_parameter(uname, value)
    return atmo


def opaque_to_dict(op) -> dict:
    return {k: np.asarray(getattr(op, k)).tolist()
            for k in ("sphere_centers", "sphere_radii", "sphere_albedos",
                      "sphere_unshaded", "box_world_to_box", "box_half_sizes",
                      "box_albedos", "light_dir", "ambient", "sky_color",
                      "star_intensity")}


def opaque_from_dict(d: dict):
    import jax.numpy as jnp

    from ..render.opaque import OpaqueScene

    return OpaqueScene(**{k: jnp.asarray(v, jnp.float32)
                          for k, v in d.items()})


def save_scene(scene: Scene, path: str) -> None:
    doc = {"atmospheres": [atmosphere_to_dict(a) for a in scene.atmospheres]}
    if scene.opaque is not None:
        doc["opaque"] = opaque_to_dict(scene.opaque)
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)


def load_scene(path: str) -> Scene:
    with open(path) as f:
        doc = json.load(f)
    opaque = opaque_from_dict(doc["opaque"]) if "opaque" in doc else None
    return Scene(atmospheres=[atmosphere_from_dict(d)
                              for d in doc["atmospheres"]],
                 opaque=opaque)
