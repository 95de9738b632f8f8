"""Cloud raymarcher and full-frame demo renders."""

import dataclasses

import numpy as np

from godot_atmosphere_shader_tpu.models.demo import (build_demo_scene,
                                                     demo_camera, demo_variant)
from godot_atmosphere_shader_tpu.models.params import VARIANTS
from godot_atmosphere_shader_tpu.models.scene import MODE_FAR, MODE_NEAR
import pytest


def _render(variant="clouds", procedural=True, pose="space", hw=64, t=0.0):
    scene = build_demo_scene(variant=variant, procedural=procedural)
    cam = demo_camera(pose)
    scene.update(t, cam)
    out = scene.render(cam, hw, hw)
    return scene, np.asarray(out["color"]), np.asarray(out["alpha"])


@pytest.mark.slow
def test_demo_scene_renders_finite():
    _, img, alpha = _render()
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    assert (alpha >= 0).all() and (alpha <= 1).all()
    assert img.max() > 0.05  # something visible


def test_clouds_add_signal_over_no_clouds():
    _, img_nc, _ = _render(variant="no_clouds")
    _, img_cl, _ = _render(variant="clouds")
    assert np.abs(img_cl - img_nc).max() > 0.01


@pytest.mark.slow
def test_cloud_variants_differ():
    _, img32, _ = _render(variant="clouds")
    _, img64, _ = _render(variant="clouds_high")
    assert np.abs(img64 - img32).max() > 1e-4


@pytest.mark.slow
def test_raymarched_lighting_variant():
    _, img, _ = _render(variant="clouds_high_rm", hw=48)
    assert np.isfinite(img).all()


@pytest.mark.slow
def test_texture_and_procedural_modes_both_render():
    _, img_p, _ = _render(procedural=True, hw=48)
    _, img_t, _ = _render(procedural=False, hw=48)
    assert np.isfinite(img_p).all() and np.isfinite(img_t).all()
    # same scene structure: the planet/atmosphere silhouette should agree
    # (clouds differ in detail between noise bases)
    lit_p = img_p.mean(-1) > 0.02
    lit_t = img_t.mean(-1) > 0.02
    agreement = (lit_p == lit_t).mean()
    assert agreement > 0.9


def test_coverage_rotation_animates_clouds():
    _, img_a, _ = _render(t=0.0)
    # clouds_rotation_speed default 1°/s — rotate far enough to see movement
    _, img_b, _ = _render(t=100.0)
    assert np.abs(img_a - img_b).max() > 1e-4


def test_depth_composition_clips_atmosphere():
    """Opaque geometry in front must clip the raymarch (t_end = min(t_end,
    linear_depth)) — the moon occludes atmosphere behind it."""
    scene, img, alpha = _render(variant="no_clouds", pose="space", hw=64)
    # compare against a no-opaque render: alpha where the planet ground hides
    # atmosphere backside should differ
    cam = demo_camera("space")
    scene2 = build_demo_scene(variant="no_clouds")
    scene2.opaque = None
    scene2.update(0.0, cam)
    out2 = scene2.render(cam, 64, 64)
    a2 = np.asarray(out2["alpha"])
    assert np.abs(alpha - a2).max() > 0.05


def test_lod_mode_switch():
    """planet_atmosphere.gd:285-312: near/far switch with 1.1 margin."""
    scene = build_demo_scene(variant="no_clouds")
    atmo = scene.atmospheres[0]
    far_cam = demo_camera("space")  # |(0,150,420)| ≈ 471 > clip ≈ 208
    atmo.update(0.0, far_cam)
    assert atmo.mode == MODE_FAR
    near_cam = demo_camera("interior")
    atmo.update(0.0, near_cam)
    assert atmo.mode == MODE_NEAR
    # force_fullscreen pins near mode
    atmo.force_fullscreen = True
    atmo.update(0.0, far_cam)
    assert atmo.mode == MODE_NEAR
    # clip distance formula: 1.75·(R+H+near)·1.1
    np.testing.assert_allclose(atmo.atmo_clip_distance,
                               1.75 * (100 + 8 + 0.1) * 1.1, rtol=1e-6)


def test_multi_planet_scene():
    """Two atmospheres composite far→near like Godot's transparent sorting."""
    from godot_atmosphere_shader_tpu.models.scene import (Node3D,
                                                          PlanetAtmosphere,
                                                          Scene)

    sun = Node3D(position=(0.0, 0.0, 600.0))
    a1 = PlanetAtmosphere(planet_radius=100.0, atmosphere_height=8.0, sun=sun,
                          custom_shader="no_clouds", position=(0.0, 0.0, 0.0))
    a1.set_shader_parameter("u_density", 0.5)
    a1.set_shader_parameter("u_scattering_strength", 1.0)
    a2 = PlanetAtmosphere(planet_radius=30.0, atmosphere_height=4.0, sun=sun,
                          custom_shader="v1_no_clouds",
                          position=(-150.0, 0.0, 100.0))
    scene = Scene(atmospheres=[a1, a2])
    cam = demo_camera("space")
    scene.update(0.0, cam)
    out = scene.render(cam, 64, 64)
    img = np.asarray(out["color"])
    assert np.isfinite(img).all() and img.max() > 0.01


@pytest.mark.slow
def test_rm_lighting_without_coverage_interp():
    """The per-sun-step coverage evaluation branch (coverage_interp off)."""
    import dataclasses

    from godot_atmosphere_shader_tpu.models.demo import demo_variant
    from godot_atmosphere_shader_tpu.render.renderer import render_frame

    scene = build_demo_scene(variant="clouds_high_rm", procedural=True)
    cam = demo_camera("space")
    scene.update(0.0, cam)
    atmo = scene.atmospheres[0]
    cfg_off = dataclasses.replace(atmo.config, cloud_coverage_interp=False)
    out = render_frame((atmo.build_params(),), (cfg_off,), cam, scene.opaque,
                       48, 48)
    img = np.asarray(out["color"])
    assert np.isfinite(img).all() and img.max() > 0.01
    # the two coverage strategies must agree closely (short sun march)
    out2 = render_frame((atmo.build_params(),), (atmo.config,), cam,
                        scene.opaque, 48, 48)
    img2 = np.asarray(out2["color"])
    assert np.abs(img - img2).mean() < 0.02
