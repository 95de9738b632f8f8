"""Cross-cutting behaviors: reverse-Z toggle, sphere-depth blend, CLI, chaining."""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from godot_atmosphere_shader_tpu.models.demo import build_demo_scene, demo_camera
from godot_atmosphere_shader_tpu.models.params import VARIANTS
from godot_atmosphere_shader_tpu.render.renderer import render_frame


def test_standard_z_matches_reverse_z():
    """The depth convention is internal plumbing: with a consistent opaque
    pass, reverse-Z and standard-Z frames must match (REVERSE_Z define,
    planet_atmosphere_main.gdshaderinc:22)."""
    scene = build_demo_scene(variant="no_clouds")
    cam = demo_camera("space")
    scene.update(0.0, cam)
    atmo = scene.atmospheres[0]
    p = atmo.build_params()
    cfg_rz = VARIANTS["no_clouds"]
    cfg_sz = dataclasses.replace(cfg_rz, reverse_z=False)
    img_rz = np.asarray(render_frame((p,), (cfg_rz,), cam, scene.opaque, 48, 48)["color"])
    img_sz = np.asarray(render_frame((p,), (cfg_sz,), cam, scene.opaque, 48, 48)["color"])
    np.testing.assert_allclose(img_rz, img_sz, atol=1e-4)


def test_sphere_depth_factor_blends_to_analytic_ground():
    """u_sphere_depth_factor=1 replaces buffer depth with the analytic ground
    sphere (planet_atmosphere_main.gdshaderinc:154-160) — with our analytic
    opaque pass the planet IS a sphere, so frames stay close; the factor
    must still change pixels where other geometry (moon/box) differs."""
    scene = build_demo_scene(variant="no_clouds")
    cam = demo_camera("space")
    scene.update(0.0, cam)
    atmo = scene.atmospheres[0]
    p0 = atmo.build_params()
    p1 = dataclasses.replace(p0, sphere_depth_factor=jnp.float32(1.0))
    cfg = VARIANTS["no_clouds"]
    img0 = np.asarray(render_frame((p0,), (cfg,), cam, scene.opaque, 64, 64)["color"])
    img1 = np.asarray(render_frame((p1,), (cfg,), cam, scene.opaque, 64, 64)["color"])
    diff = np.abs(img1 - img0)
    assert diff.max() > 1e-4  # moon/box occlusion replaced by sphere depth
    assert diff.mean() < 0.05  # but the planet-ground bulk is unchanged


def test_megakernel_background_chaining_interpret():
    """Chained megakernel passes == XLA multi-layer composite (tiny frame,
    interpret mode)."""
    from godot_atmosphere_shader_tpu.models.scene import PlanetAtmosphere
    from godot_atmosphere_shader_tpu.ops.pallas.megakernel import render_frame_pallas

    scene = build_demo_scene(variant="no_clouds")
    sun = scene.atmospheres[0].sun
    moon = PlanetAtmosphere(planet_radius=10.0, atmosphere_height=2.0, sun=sun,
                            custom_shader="no_clouds",
                            position=(-188.991, 0.0, 192.584))
    moon.set_shader_parameter("u_density", 2.0)
    scene.atmospheres.append(moon)
    cam = demo_camera("space")
    scene.update(0.0, cam)
    h, w = 16, 128

    params = [a.build_params() for a in scene.atmospheres]
    configs = [a.config for a in scene.atmospheres]
    ref = np.asarray(render_frame(tuple(params), tuple(configs), cam,
                                  scene.opaque, h, w)["color"])

    out = render_frame_pallas(params[0], configs[0], cam, scene.opaque,
                              h, w, block=(8, 128), interpret=True,
                              want_depth=True)
    out = render_frame_pallas(params[1], configs[1], cam, None, h, w,
                              block=(8, 128), interpret=True,
                              background=(out["color"], out["linear_depth"]))
    np.testing.assert_allclose(np.asarray(out["color"]), ref,
                               atol=1e-5, rtol=1e-4)


def test_cli_render_smoke(tmp_path):
    """Drive the CLI entry point end-to-end on CPU (xla renderer)."""
    from godot_atmosphere_shader_tpu.cli import main

    out = str(tmp_path / "frame.png")
    rc = main(["render", "--variant", "v1_no_clouds", "--pose", "space",
               "--size", "32", "--renderer", "xla", "-o", out])
    assert rc == 0 and os.path.exists(out)
    from godot_atmosphere_shader_tpu.utils.image_io import read_png

    img = read_png(out)
    assert img.shape == (32, 32, 3)


def test_cli_bake_and_export(tmp_path):
    from godot_atmosphere_shader_tpu.cli import main

    lut_path = str(tmp_path / "lut.npy")
    assert main(["bake-lut", "--resolution", "32", "-o", lut_path]) == 0
    assert np.load(lut_path).shape == (32, 32)

    cm_path = str(tmp_path / "cm.png")
    assert main(["export-cubemap", "--resolution", "8", "-o", cm_path]) == 0
    assert os.path.exists(cm_path) and os.path.exists(cm_path + ".import")
