"""PNG codec, cubemap atlas, .import sidecar (the L4 export pipeline)."""

import os

import numpy as np

from godot_atmosphere_shader_tpu.utils.image_io import (
    atlas_to_cubemap, cubemap_atlas, read_png, to_uint8, write_import_file,
    write_png)


def test_png_roundtrip_rgb(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (20, 31, 3), dtype=np.uint8)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(back, img)


def test_png_roundtrip_gray(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    p = str(tmp_path / "g.png")
    write_png(p, img)
    np.testing.assert_array_equal(read_png(p), img)


def test_to_uint8_rounds():
    np.testing.assert_array_equal(
        to_uint8(np.array([0.0, 0.5, 1.0, 2.0, -1.0])),
        np.array([0, 128, 255, 255, 0], np.uint8))


def test_atlas_roundtrip():
    rng = np.random.default_rng(2)
    faces = rng.random((6, 8, 8)).astype(np.float32)
    atlas = cubemap_atlas(faces)
    assert atlas.shape == (16, 24)  # 3×2 layout (noise_cubemap.gd:143-155)
    np.testing.assert_array_equal(atlas_to_cubemap(atlas), faces)


def test_import_sidecar(tmp_path):
    p = str(tmp_path / "cov.png")
    write_png(p, np.zeros((4, 4), np.uint8))
    out = write_import_file(p)
    assert out.endswith(".import") and os.path.exists(out)
    text = open(out).read()
    # parity with tools/plugin.gd:63-80
    assert 'importer="cubemap_texture"' in text
    assert "slices/arrangement=1" in text
    assert 'source_file="res://cov.png"' in text
