"""Multi-chip megakernel: row-sharded bands == single render (interpret mode)."""

import numpy as np
import pytest

from godot_atmosphere_shader_tpu.models.demo import build_demo_scene, demo_camera
from godot_atmosphere_shader_tpu.ops.pallas.megakernel import (
    render_band_pallas, render_frame_pallas)


def test_band_rendering_matches_full_frame():
    """Stacked bands (the shard_map building block) == one full-frame call."""
    scene = build_demo_scene(variant="no_clouds", procedural=True)
    cam = demo_camera("space")
    scene.update(0.0, cam)
    atmo = scene.atmospheres[0]
    p, c = atmo.build_params(), atmo.config
    h, w = 32, 128

    full = np.asarray(render_frame_pallas(p, c, cam, scene.opaque, h, w,
                                          block=(8, 128),
                                          interpret=True)["color"])
    bands = [np.asarray(render_band_pallas(p, c, cam, scene.opaque, h, w,
                                           row0, 8, block=(8, 128),
                                           interpret=True)["color"])
             for row0 in (0, 8, 16, 24)]
    stacked = np.concatenate(bands, axis=0)
    np.testing.assert_allclose(stacked, full, atol=1e-6)


def test_shard_map_pallas_interpret():
    """The full shard_map + megakernel path on the 8-device CPU mesh."""
    import jax

    from godot_atmosphere_shader_tpu.parallel.sharding import (
        make_mesh, render_frame_pallas_sharded)
    from godot_atmosphere_shader_tpu.render.renderer import render_frame

    scene = build_demo_scene(variant="no_clouds", procedural=True)
    cam = demo_camera("space")
    scene.update(0.0, cam)
    atmo = scene.atmospheres[0]
    p, c = atmo.build_params(), atmo.config
    h, w = 64, 128

    mesh = make_mesh()
    sharded = np.asarray(render_frame_pallas_sharded(
        p, c, cam, scene.opaque, h, w, mesh, block=(8, 128), interpret=True))
    ref = np.asarray(render_frame((p,), (c,), cam, scene.opaque, h, w)["color"])
    np.testing.assert_allclose(sharded, ref, atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_shard_map_texture_mode_interpret():
    """Texture-mode pyramids replicate to every shard (closure broadcast):
    sharded bands == the single texture-mode render."""
    import dataclasses

    from godot_atmosphere_shader_tpu.parallel.sharding import (
        make_mesh, render_frame_pallas_sharded)
    from godot_atmosphere_shader_tpu.ops.pallas.texsample import (
        build_latlong_pyramid, build_tex3d_pyramid)

    scene = build_demo_scene(variant="clouds", procedural=False)
    cam = demo_camera("avatar")
    scene.update(0.0, cam)
    atmo = scene.atmospheres[0]
    p = atmo.build_params()
    sdata, smeta = build_tex3d_pyramid(np.asarray(p.cloud_shape_texture))
    cdata, cmeta = build_latlong_pyramid(np.asarray(p.cloud_coverage_cubemap))
    c = dataclasses.replace(
        atmo.config, cloud_shape_tex_meta=smeta, cloud_shape_interp=True,
        cloud_coverage_tex_meta=cmeta, cloud_coverage_interp=True)
    tex = (sdata, cdata)
    h, w = 64, 128

    mesh = make_mesh()
    sharded = np.asarray(render_frame_pallas_sharded(
        p, c, cam, scene.opaque, h, w, mesh, block=(8, 128), interpret=True,
        tex_data=tex))
    full = np.asarray(render_frame_pallas(p, c, cam, scene.opaque, h, w,
                                          block=(8, 128), interpret=True,
                                          tex_data=tex)["color"])
    np.testing.assert_allclose(sharded, full, atol=1e-5)
