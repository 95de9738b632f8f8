"""The engine-capture comparison tooling (tools/compare_captures.py).

The renders themselves need a real Godot engine (ROADMAP #5); what must
work TODAY — so the gap closes the day an engine shows up — is the
texture-dump ingestion (VERDICT r4 next #8): a NoiseTexture3D z-slice dump
and the plugin's own 3×2 cubemap atlas must load, match their source
texels, and drive a render when injected into the scene.
"""

import importlib.util
import os
import pathlib
import sys

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def cc():
    spec = importlib.util.spec_from_file_location(
        "compare_captures", ROOT / "tools" / "compare_captures.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_shape_dump_npy_and_slices_agree(cc, tmp_path):
    from godot_atmosphere_shader_tpu.utils.image_io import write_png

    rng = np.random.default_rng(3)
    vol = rng.random((8, 16, 16)).astype(np.float32)
    npy = tmp_path / "shape.npy"
    np.save(npy, vol)
    got_npy = cc.load_shape_dump(str(npy))
    np.testing.assert_array_equal(got_npy, vol)

    # the GDScript procedure saves one PNG per z-slice (8-bit)
    d = tmp_path / "slices"
    d.mkdir()
    for z in range(vol.shape[0]):
        write_png(str(d / f"slice_{z:03d}.png"),
                  (vol[z] * 255).astype(np.uint8))
    got_png = cc.load_shape_dump(str(d))
    assert got_png.shape == vol.shape
    assert np.abs(got_png - vol).max() <= 1.0 / 255.0 + 1e-6


def test_coverage_atlas_roundtrip(cc, tmp_path):
    from godot_atmosphere_shader_tpu.utils.image_io import (cubemap_atlas,
                                                            write_png)

    rng = np.random.default_rng(4)
    faces = rng.random((6, 16, 16)).astype(np.float32)
    atlas = cubemap_atlas((faces * 255).astype(np.uint8))
    p = tmp_path / "atlas.png"
    write_png(str(p), atlas)
    got = cc.load_coverage_atlas(str(p))
    assert got.shape == (6, 16, 16)
    assert np.abs(got - faces).max() <= 1.0 / 255.0 + 1e-6

    bad = tmp_path / "bad.png"
    write_png(str(bad), np.zeros((16, 20), np.uint8))
    with pytest.raises(SystemExit, match="3x2"):
        cc.load_coverage_atlas(str(bad))


def test_injected_dump_drives_render(cc, tmp_path):
    """End-to-end: an engine texture dump injected through
    set_shader_parameter must actually be the texture the render samples
    (a constant-1 coverage dump lights strictly more cloud than a
    constant-0 one)."""
    from godot_atmosphere_shader_tpu.models.demo import (build_demo_scene,
                                                         demo_camera)

    rng = np.random.default_rng(5)
    shape = (0.4 + 0.4 * rng.random((8, 16, 16))).astype(np.float32)
    outs = {}
    for cov_val in (0.0, 1.0):
        scene = build_demo_scene(variant="clouds", procedural=False)
        cov = np.full((6, 16, 16), cov_val, np.float32)
        for atmo in scene.atmospheres:
            atmo.set_shader_parameter("u_cloud_shape_texture", shape)
            atmo.set_shader_parameter("u_cloud_coverage_cubemap", cov)
        cam = demo_camera("avatar")
        scene.update(0.0, cam)
        out = scene.render(cam, 24, 48, renderer="xla")
        outs[cov_val] = np.asarray(out["alpha"])
        assert np.isfinite(outs[cov_val]).all()
    assert outs[1.0].mean() > outs[0.0].mean() + 0.01
