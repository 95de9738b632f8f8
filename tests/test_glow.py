"""Environment glow output stage (render/glow.py, VERDICT r2 missing #3).

The demo env blooms the HDR sun sphere (albedo (4,4,4)) through Godot's
glow chain; these tests pin our replacement's structure: energy appears
only around HDR sources, spreads with level depth, and the tscn importer
carries the demo's Environment block."""

import numpy as np
import pytest

from godot_atmosphere_shader_tpu.render.glow import (GlowSettings, apply_glow,
                                                     _blur3, _down2)


def _hdr_frame(h=256, w=256):
    # big enough that the deep blur mips (level 6 = /64) keep locality
    img = np.full((h, w, 3), 0.2, np.float32)
    img[124:132, 124:132] = 8.0  # HDR source well over the threshold
    return img


def test_glow_disabled_is_identity():
    img = _hdr_frame()
    out = np.asarray(apply_glow(img, GlowSettings(enabled=False)))
    np.testing.assert_array_equal(out, img)


def test_glow_blooms_only_hdr_sources():
    img = _hdr_frame()
    out = np.asarray(apply_glow(img, GlowSettings.demo()))
    added = out - img
    assert added.min() >= -1e-5  # additive blend never darkens
    # halo: pixels NEAR the source gained energy though they were dim
    assert added[116, 128].mean() > 1e-3
    # far corner: a small fraction of the near halo
    assert added[8, 8].mean() < added[116, 128].mean() * 0.3
    # LDR-only frame gains nothing
    ldr = np.full((64, 64, 3), 0.5, np.float32)
    out_ldr = np.asarray(apply_glow(ldr, GlowSettings.demo()))
    np.testing.assert_allclose(out_ldr, ldr, atol=1e-5)


def test_deeper_levels_spread_wider():
    img = _hdr_frame()
    near = GlowSettings(levels=(1.0, 0, 0, 0, 0, 0, 0), intensity=1.0,
                        strength=1.0, hdr_scale=1.0)
    far = GlowSettings(levels=(0, 0, 0, 0, 0, 1.0, 0), intensity=1.0,
                       strength=1.0, hdr_scale=1.0)
    a_near = np.asarray(apply_glow(img, near)) - img
    a_far = np.asarray(apply_glow(img, far)) - img
    # at distance, only the deep level contributes
    assert a_far[64, 64].mean() > a_near[64, 64].mean()


def test_blur_and_down_preserve_mean():
    rng = np.random.default_rng(0)
    x = rng.random((32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(float(np.asarray(_blur3(x)).mean()),
                               float(x.mean()), atol=5e-3)
    np.testing.assert_allclose(float(np.asarray(_down2(x)).mean()),
                               float(x.mean()), atol=1e-6)


def test_tscn_imports_environment_glow():
    import os

    tscn = ("/root/reference/addons/zylann.atmosphere/demo/"
            "planet_atmosphere_test.tscn")
    if not os.path.exists(tscn):
        pytest.skip("reference checkout not present")
    from godot_atmosphere_shader_tpu.models.tscn import load_tscn

    env = load_tscn(tscn).scene.environment
    assert env is not None and env.enabled
    assert env.intensity == 4.0
    assert env.strength == 0.8
    assert env.hdr_scale == 1.0
    # glow_levels/4 and /6 set to 1.0, /3 explicitly 0
    assert env.levels[3] == 1.0 and env.levels[5] == 1.0
    assert env.levels[2] == 0.0


@pytest.mark.slow
def test_glow_golden_sunward():
    """Committed golden of the full pipeline at the sunward pose: tscn
    import (real panorama + Environment glow) → XLA render → glow →
    sRGB.  Pins the whole output stage against silent drift."""
    import os

    tscn = ("/root/reference/addons/zylann.atmosphere/demo/"
            "planet_atmosphere_test.tscn")
    if not os.path.exists(tscn):
        pytest.skip("reference checkout not present")
    from godot_atmosphere_shader_tpu.models.demo import demo_camera
    from godot_atmosphere_shader_tpu.models.tscn import load_tscn
    from godot_atmosphere_shader_tpu.utils.color import linear_to_srgb
    from godot_atmosphere_shader_tpu.utils.image_io import read_png, to_uint8

    sc = load_tscn(tscn).scene
    cam = demo_camera("sunward")
    sc.update(0.0, cam)
    img = np.asarray(sc.render(cam, 96, 96, renderer="xla")["color"])
    out = np.asarray(sc.apply_environment(img))
    got = to_uint8(np.asarray(linear_to_srgb(np.clip(out, 0, 1))))
    path = os.path.join(os.path.dirname(__file__), "golden_images",
                        "sunward_glow.png")
    golden = read_png(path).astype(np.int16)
    diff = np.abs(got.astype(np.int16) - golden)
    assert diff.max() <= 2, (
        f"{int((diff > 2).sum())} px exceed tolerance, max {int(diff.max())}")


def test_scene_apply_environment_roundtrip():
    from godot_atmosphere_shader_tpu.models.scene import Scene

    img = _hdr_frame()
    plain = Scene()
    np.testing.assert_array_equal(np.asarray(plain.apply_environment(img)),
                                  img)
    lit = Scene(environment=GlowSettings.demo())
    out = np.asarray(lit.apply_environment(img))
    assert (out - img).max() > 0.02
