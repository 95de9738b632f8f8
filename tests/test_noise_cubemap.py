"""NoiseCubemap resource semantics (noise_cubemap.gd parity)."""

import os

import numpy as np

from godot_atmosphere_shader_tpu.models.noise_cubemap import NoiseCubemap
from godot_atmosphere_shader_tpu.ops.noise import NoiseSpec
from godot_atmosphere_shader_tpu.utils.image_io import read_png


def test_lazy_coalesced_generation():
    cm = NoiseCubemap(resolution=8)
    assert cm.generation_count == 0  # nothing generated yet
    cm.get_faces()
    assert cm.generation_count == 1
    cm.get_faces()
    assert cm.generation_count == 1  # cached
    # several property writes coalesce into one regeneration
    cm.scale = (50.0, 50.0, 50.0)
    cm.resolution = 16
    cm.noise = NoiseSpec(noise_type="value", frequency=0.2)
    assert cm.generation_count == 1
    faces = cm.get_faces()
    assert cm.generation_count == 2
    assert faces.shape == (6, 16, 16)
    assert (faces >= 0).all() and (faces <= 1).all()


def test_resolution_clamped():
    cm = NoiseCubemap(resolution=8)
    cm.resolution = 10000
    assert cm.resolution == 4096  # clampi(value, 1, 4096)
    cm.resolution = 0
    assert cm.resolution == 1


def test_same_value_does_not_dirty():
    cm = NoiseCubemap(resolution=8, scale=(10.0, 10.0, 10.0))
    cm.get_faces()
    cm.scale = (10.0, 10.0, 10.0)  # unchanged
    cm.resolution = 8  # unchanged
    cm.get_faces()
    assert cm.generation_count == 1


def test_save_as_image(tmp_path):
    cm = NoiseCubemap(resolution=8)
    p = str(tmp_path / "cm.png")
    sidecar = cm.save_as_image(p)
    assert os.path.exists(p) and os.path.exists(sidecar)
    img = read_png(p)
    assert img.shape == (16, 24)  # 3×2 atlas of 8px faces
    text = open(sidecar).read()
    assert 'importer="cubemap_texture"' in text
