"""Vertical cloud LOD (``cloud_lod``/``cloud_coverage_lod``) quality bounds.

``render_clouds_lod`` marches the cloud layer once per ``cloud_lod``-row
group and nearest-upsamples light/alpha before the full-res blend
(``ops/clouds.py``); ``cloud_coverage_lod`` additionally evaluates the
coverage knots on a further-coarsened grid — the vertical analog of the
reference band-limiting coverage to a 256² cubemap.

Measured at 1080p on the real chip the lod=2 delta is small (interior mean
|Δ| 7e-4, avatar 4.4e-3); at this test resolution (144 rows) the grouping is
~7× coarser relative to the image, so bounds here are proportionally looser.
The megakernel runs the same shared code with a VMEM layout-normalization
round-trip (bit-identical values; see megakernel parity tests).
"""

import dataclasses

import numpy as np
import pytest


RES = (144, 216)


def _render(pose="interior", **cfg_kw):
    from godot_atmosphere_shader_tpu.models.demo import (build_demo_scene,
                                                         demo_camera)

    scene = build_demo_scene(variant="clouds_high", procedural=True)
    a = scene.atmospheres[0]
    a.set_custom_shader(dataclasses.replace(a.config, **cfg_kw))
    cam = demo_camera(pose)
    scene.update(0.0, cam)
    return scene.render(cam, *RES, renderer="xla")


# cloud_lod_interior=0: these tests pin EXPLICIT cloud_lod values at the
# in-shell interior pose, so the camera-conditional policy must stay out
BASE = dict(cloud_coverage_interp=True, cloud_coverage_knots=8,
            cloud_lod_interior=0)


@pytest.mark.slow
def test_lod2_stays_close_to_full_res():
    full = np.asarray(_render(cloud_lod=1, cloud_coverage_lod=1, **BASE)["color"])
    lod2 = np.asarray(_render(cloud_lod=2, cloud_coverage_lod=1, **BASE)["color"])
    d = np.abs(full - lod2)
    # measured at this res: mean 0.0017, p99 0.053
    assert d.mean() < 0.006, d.mean()
    assert np.percentile(d, 99) < 0.12


@pytest.mark.slow
def test_coverage_lod_stays_close():
    lod2 = np.asarray(_render(cloud_lod=2, cloud_coverage_lod=1, **BASE)["color"])
    prof = np.asarray(_render(cloud_lod=2, cloud_coverage_lod=2, **BASE)["color"])
    d = np.abs(lod2 - prof)
    # measured: mean 0.0013, p99 0.045
    assert d.mean() < 0.005, d.mean()
    assert np.percentile(d, 99) < 0.12


def test_lod_requires_divisible_height():
    with pytest.raises(ValueError):
        from godot_atmosphere_shader_tpu.models.demo import (build_demo_scene,
                                                             demo_camera)

        scene = build_demo_scene(variant="clouds_high", procedural=True)
        a = scene.atmospheres[0]
        a.set_custom_shader(dataclasses.replace(a.config, cloud_lod=2, **BASE))
        cam = demo_camera("interior")
        scene.update(0.0, cam)
        scene.render(cam, 143, 216, renderer="xla")


def test_lod_alpha_and_finiteness():
    out = _render(cloud_lod=2, cloud_coverage_lod=2, **BASE)
    color, alpha = np.asarray(out["color"]), np.asarray(out["alpha"])
    assert np.isfinite(color).all() and np.isfinite(alpha).all()
    # the atmosphere's 0.99 dither cap applies pre-cloud-blend; the cloud
    # alpha/additive mix can legitimately approach 1.0
    assert alpha.min() >= 0.0 and alpha.max() <= 1.0 + 1e-6


# ---------------------------------------------------------------------------
# camera-conditional interior LOD (VariantConfig.cloud_lod_interior)
# ---------------------------------------------------------------------------

def _demo_atmo():
    from godot_atmosphere_shader_tpu.models.demo import build_demo_scene

    return build_demo_scene(variant="clouds_high", procedural=True)


def test_interior_policy_engages_and_releases_with_hysteresis():
    """Engage at d < R+H, release at d > 1.1·(R+H) — the reference's
    near/far hysteresis ratio (planet_atmosphere.gd:300-312) so the kernel
    swap can't flip-flop at the shell boundary."""
    scene = _demo_atmo()
    a = scene.atmospheres[0]
    assert a.config.cloud_lod_interior == 4  # the demo default
    shell = a.planet_radius + a.atmosphere_height  # 108

    # approach from outside through the hysteresis band: stays OFF
    a.update(0.0, cam_pos=(0.0, shell * 1.05, 0.0))
    assert a.effective_config().cloud_lod == a.config.cloud_lod == 2
    # cross into the shell: engages
    a.update(0.0, cam_pos=(0.0, shell - 4.0, 0.0))
    assert a.effective_config().cloud_lod == 4
    # back out into the band (shell < d < 1.1·shell): stays ON
    a.update(0.0, cam_pos=(0.0, shell * 1.05, 0.0))
    assert a.effective_config().cloud_lod == 4
    # past the release distance: OFF again
    a.update(0.0, cam_pos=(0.0, shell * 1.2, 0.0))
    assert a.effective_config().cloud_lod == 2
    # the user config is never mutated by the policy
    assert a.config.cloud_lod == 2 and a.config.cloud_lod_interior == 4


def test_interior_policy_zero_disables():
    scene = _demo_atmo()
    a = scene.atmospheres[0]
    a.set_custom_shader(dataclasses.replace(a.config, cloud_lod_interior=0))
    a.update(0.0, cam_pos=(0.0, 100.0, 0.0))  # deep inside the shell
    assert a.effective_config() == a.config
    assert a.effective_config().cloud_lod == 2


def test_interior_policy_inert_without_clouds():
    from godot_atmosphere_shader_tpu.models.demo import build_demo_scene

    scene = build_demo_scene(variant="no_clouds")
    a = scene.atmospheres[0]
    a.set_custom_shader(dataclasses.replace(a.config, cloud_lod_interior=4))
    a.update(0.0, cam_pos=(0.0, 100.0, 0.0))
    assert a.effective_config() == a.config


@pytest.mark.slow
def test_interior_policy_quality_bound():
    """Scene.render at the interior pose with the policy engaged vs the
    same frame policy-off: the lod-4 delta against the shipped lod-2
    default.  Measured at 1080p on the chip: mean |Δ| 0.0012 (lod4 vs
    full-res) vs 0.00087 (lod2); at this 144-row test resolution the
    grouping is ~7× coarser relative to the image, so the bound is
    proportionally looser (same framing as the lod-2 tests above)."""
    from godot_atmosphere_shader_tpu.models.demo import demo_camera

    cam = demo_camera("interior")

    scene = _demo_atmo()
    scene.update(0.0, cam)
    assert scene.atmospheres[0].effective_config().cloud_lod == 4
    on = np.asarray(scene.render(cam, *RES, renderer="xla")["color"])

    scene = _demo_atmo()
    a = scene.atmospheres[0]
    a.set_custom_shader(dataclasses.replace(a.config, cloud_lod_interior=0))
    scene.update(0.0, cam)
    off = np.asarray(scene.render(cam, *RES, renderer="xla")["color"])

    d = np.abs(on - off)
    assert d.max() > 0.0  # the policy actually changed the kernel
    assert d.mean() < 0.008, d.mean()
    assert np.percentile(d, 99) < 0.15
