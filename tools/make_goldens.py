"""Generate golden render statistics for the five BASELINE.json configs.

Writes ``tests/goldens.json``: per-config overall stats plus a coarse 4×6
grid of region means — strong enough to catch any real rendering regression,
loose enough to survive compiler/version drift.  Regenerate ONLY when an
intentional visual change lands:  python tools/make_goldens.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402


def region_means(img: np.ndarray, ny: int = 4, nx: int = 6) -> list:
    h, w = img.shape[:2]
    out = []
    for i in range(ny):
        for j in range(nx):
            block = img[i * h // ny:(i + 1) * h // ny,
                        j * w // nx:(j + 1) * w // nx]
            out.append(round(float(block.mean()), 6))
    return out


def build_configs():
    """The five benchmark configs from BASELINE.json, at test resolution."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from godot_atmosphere_shader_tpu.models.demo import (build_demo_scene,
                                                         demo_camera)
    from godot_atmosphere_shader_tpu.models.scene import Node3D, PlanetAtmosphere
    from godot_atmosphere_shader_tpu.ops.optical_depth import bake_optical_depth

    h, w = 96, 144
    out = {}

    def render(scene, pose, hw=(h, w)):
        cam = demo_camera(pose)
        scene.update(0.0, cam)
        return np.asarray(scene.render(cam, hw[0], hw[1])["color"])

    # 1. v1 fake-color, no clouds, exterior view
    out["v1_exterior"] = render(build_demo_scene("v1_no_clouds"), "exterior")

    # 2. scattering no-clouds + the LUT bake itself
    out["v2_exterior"] = render(build_demo_scene("no_clouds"), "exterior")
    lut = np.asarray(bake_optical_depth(100.0, 8.0, 0.5))
    out["lut"] = lut[..., None]

    # 3. scattering + clouds (procedural coverage), space view
    out["clouds_space"] = render(build_demo_scene("clouds"), "space")

    # 4. clouds_high, interior camera (depth composition, reverse-Z)
    out["clouds_high_interior"] = render(build_demo_scene("clouds_high"),
                                         "interior")

    # 5. clouds_high_rm + multi-planet with far LOD
    scene5 = build_demo_scene("clouds_high_rm")
    sun = scene5.atmospheres[0].sun
    moon_atmo = PlanetAtmosphere(
        planet_radius=10.0, atmosphere_height=2.0, sun=sun,
        custom_shader="v1_no_clouds", position=(-188.991, 0.0, 192.584))
    scene5.atmospheres.append(moon_atmo)
    out["rm_multiplanet_space"] = render(scene5, "space")

    return out


def main() -> None:
    from godot_atmosphere_shader_tpu.utils.image_io import to_uint8, write_png

    renders = build_configs()
    tests_dir = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "tests"))
    img_dir = os.path.join(tests_dir, "golden_images")
    os.makedirs(img_dir, exist_ok=True)
    doc = {}
    for name, img in renders.items():
        doc[name] = {
            "shape": list(img.shape),
            "mean": round(float(img.mean()), 6),
            "std": round(float(img.std()), 6),
            "max": round(float(img.max()), 6),
            "regions": region_means(img.mean(axis=-1) if img.ndim == 3 else img),
        }
        # per-pixel tier (VERDICT r1 #7): committed golden *images* so a
        # one-region spatial artifact (seam, band, offset clouds) fails CI
        # even when coarse statistics survive.  LUT is single-channel f32
        # with range > 1 — keep it stats-only.
        if img.ndim == 3 and img.shape[-1] == 3:
            write_png(os.path.join(img_dir, f"{name}.png"),
                      to_uint8(np.clip(img, 0.0, 1.0)))
    path = os.path.join(tests_dir, "goldens.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {path} + {img_dir}: {list(doc)}")





def make_texture_mode_golden():
    """Golden PNG for the interpret-mode texture kernel
    (tests/test_texture_mode.py::test_kernel_texture_mode_golden)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_texture_mode import RES, _plan_by_hand, _texture_scene

    from godot_atmosphere_shader_tpu.ops.pallas.megakernel import (
        render_scene_pallas)
    from godot_atmosphere_shader_tpu.utils.image_io import to_uint8, write_png

    scene, cam = _texture_scene()
    order, params, configs = scene._sorted_layers(cam)
    aug_configs, tex_data = _plan_by_hand(scene, params, configs)
    out = render_scene_pallas(params, aug_configs, cam, scene.opaque, *RES,
                              interpret=True, tex_data=tex_data)
    img = np.clip(np.asarray(out["color"]), 0.0, 1.0)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden_images",
        "texture_mode_avatar.png")
    write_png(path, to_uint8(img))
    print(f"wrote {path}")


if __name__ == "__main__":
    if "--texture-mode" in sys.argv:
        make_texture_mode_golden()
    else:
        main()
