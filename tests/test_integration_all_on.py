"""Everything-on integration smoke: the feature-interaction net.

Each feature has its own focused tests; this file renders ONE scene with
all of them enabled simultaneously — baked-texture pyramids, equirect
panorama background, multi-planet layer chain (far-LOD band plan), glow
output stage, and a TAA flight with variance clamp — so a regression in
how two features compose (SMEM packing order, band/pano plan interaction,
tex+pano VMEM budgets) cannot land while every per-feature test stays
green.  Interpret mode on the CPU mesh.
"""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from godot_atmosphere_shader_tpu.models.demo import build_demo_scene, demo_camera
from godot_atmosphere_shader_tpu.models.scene import PlanetAtmosphere


def _pano(h=32, w=64):
    u = (np.arange(w) + 0.5) / w
    v = (np.arange(h) + 0.5) / h
    return np.stack([np.tile(u, (h, 1)),
                     np.tile(v[:, None], (1, w)),
                     np.full((h, w), 0.25)], -1).astype(np.float32)


@pytest.fixture(scope="module")
def all_on_scene():
    scene = build_demo_scene(variant="clouds", procedural=False)
    scene.opaque = dataclasses.replace(scene.opaque, panorama=_pano())
    # second, far planet → multi-layer chain + far-LOD band plan
    scene.atmospheres.append(PlanetAtmosphere(
        planet_radius=10.0, atmosphere_height=2.0,
        sun=scene.atmospheres[0].sun, custom_shader="no_clouds",
        position=(-188.991, 0.0, 192.584)))
    return scene


def test_single_frame_all_features(all_on_scene):
    scene = all_on_scene
    cam = demo_camera("space")
    scene.update(0.25, cam)
    # Scene.render routes to the megakernel only on a TPU backend; build
    # the same plan here and run it in interpret mode on the CPU mesh
    import jax

    order, params, configs = scene._sorted_layers(cam)
    orig = jax.default_backend
    jax.default_backend = lambda: "tpu"
    try:
        plan = scene._pallas_plan(params, configs)
        pano = scene._pano_plan()
    finally:
        jax.default_backend = orig
    assert plan is not None and pano is not None
    aug_configs, tex_data = plan
    order, params, aug_configs, tex_data, bands, band_rows = (
        scene._layer_bands(order, params, aug_configs, tex_data, cam, 64))

    from godot_atmosphere_shader_tpu.ops.pallas.megakernel import (
        render_scene_pallas)

    out = render_scene_pallas(params, aug_configs, cam, scene.opaque,
                              64, 128, tex_data=tex_data, bands=bands,
                              band_rows=band_rows, pano_data=pano[0],
                              pano_meta=pano[1], interpret=True)
    img = np.asarray(out["color"])
    assert np.isfinite(img).all()
    assert img.mean() > 0.01
    # the panorama background is visible on geometry-miss rays (gradient,
    # not the starfield's near-black): check a sky corner is non-trivial
    assert img[:8, :8].mean() > 0.05

    # glow output stage composes on top
    glowed = np.asarray(scene.apply_environment(img)) \
        if scene.environment is not None else img
    assert np.isfinite(glowed).all()

    # XLA twin renders the same scene (exact samplers) — structural match
    for a in scene.atmospheres:
        a.set_custom_shader(dataclasses.replace(
            a.config, cloud_shape_interp=True, cloud_coverage_interp=True)
            if a.config.clouds_enabled else a.config)
    ref = np.asarray(scene.render(cam, 64, 128, renderer="xla")["color"])
    lit_k = img.mean(-1) > 0.02
    lit_x = ref.mean(-1) > 0.02
    assert (lit_k == lit_x).mean() > 0.9
    assert abs(float(img.mean()) - float(ref.mean())) < 0.05


def test_taa_flight_all_features(all_on_scene):
    """TAA flight over the all-on scene (panorama dropped by design for the
    in-graph loop — render_flight_taa strips it; asserts the documented
    behavior holds rather than crashing)."""
    import jax

    scene = all_on_scene
    cam = demo_camera("space")
    orig = jax.default_backend
    jax.default_backend = lambda: "tpu"  # plan builds the texture pyramids
    try:
        out = scene.render_flight(cam, [0.0, 0.016, 0.032], 64, 128,
                                  interpret=True, taa_blend=0.2,
                                  taa_clamp="variance")
    finally:
        jax.default_backend = orig
    f = np.asarray(out["color"])
    assert f.shape == (3, 64, 128, 3)
    assert np.isfinite(f).all()
    d01 = np.abs(f[1] - f[0]).mean()
    d12 = np.abs(f[2] - f[1]).mean()
    assert d12 <= d01 + 1e-6


def test_all_on_sharded_matches_unsharded(all_on_scene):
    """The everything-on composite through shard_map (VERDICT r3 #4): the
    row-sharded multi-planet chain with texture pyramids + panorama
    replicated as traced args equals the unsharded render, and the glow
    stage runs on the sharded output under plain jit (GSPMD places its
    cross-row halo exchanges)."""
    import jax

    from godot_atmosphere_shader_tpu.ops.pallas.megakernel import (
        render_scene_pallas)
    from godot_atmosphere_shader_tpu.parallel.sharding import (
        make_mesh, render_scene_pallas_sharded)

    scene = all_on_scene
    cam = demo_camera("space")
    scene.update(0.25, cam)
    orig = jax.default_backend
    jax.default_backend = lambda: "tpu"
    try:
        order, params, configs = scene._sorted_layers(cam)
        plan = scene._pallas_plan(params, configs)
        pano = scene._pano_plan()
    finally:
        jax.default_backend = orig
    assert plan is not None and pano is not None
    aug_configs, tex_data = plan
    h, w = 64, 128

    full = render_scene_pallas(params, aug_configs, cam, scene.opaque,
                               h, w, block=(8, 128), tex_data=tex_data,
                               pano_data=pano[0], pano_meta=pano[1],
                               interpret=True)
    mesh = make_mesh(jax.devices()[:4])
    shard = render_scene_pallas_sharded(params, aug_configs, cam,
                                        scene.opaque, h, w, mesh,
                                        block=(8, 128), tex_data=tex_data,
                                        pano_data=pano[0], pano_meta=pano[1],
                                        interpret=True)
    img_f = np.asarray(full["color"])
    img_s = np.asarray(shard["color"])
    np.testing.assert_allclose(img_s, img_f, atol=1e-5)
    np.testing.assert_allclose(np.asarray(shard["alpha"]),
                               np.asarray(full["alpha"]), atol=1e-5)

    # glow over the still-sharded output: plain XLA under jit — GSPMD
    # inserts whatever collectives the multi-scale blur needs
    glowed_s = np.asarray(jax.jit(scene.apply_environment)(shard["color"]))
    glowed_f = np.asarray(scene.apply_environment(img_f))
    assert np.isfinite(glowed_s).all()
    np.testing.assert_allclose(glowed_s, glowed_f, atol=1e-5)
