"""Quantified bounds for the shape-knot interpolation fast path.

``cloud_shape_interp`` evaluates the raw shape (and detail) fields at
``cloud_shape_knots + 1`` ray knots and hat-interpolates per step —
the coverage-interp trade (``tests/test_coverage_interp.py``) extended to
the shape texture.  The in-kernel texture mode *requires* it (per-step
windowed texture sampling would cost ~40 lookup batches per pixel); these
tests measure what it gives up on the procedural demo fields, where exact
per-step evaluation exists to compare against.

The shape field is higher-frequency than coverage (cloud_shape_scale times
the march span), so the interpolation is lossier — the knot count bound
here is the measured envelope, not a pixel-parity claim.  Reference chain:
``cloud_funcs.gdshaderinc:48-55`` (per-step shape + detail sampling).
"""

import dataclasses

import numpy as np
import pytest

RES = (144, 216)


def _render(pose="avatar", **cfg_kw):
    from godot_atmosphere_shader_tpu.models.demo import (build_demo_scene,
                                                         demo_camera)

    scene = build_demo_scene(variant="clouds_high", procedural=True)
    a = scene.atmospheres[0]
    cfg = dataclasses.replace(a.config, cloud_lod=1, cloud_coverage_lod=1,
                              **cfg_kw)
    a.set_custom_shader(cfg)
    cam = demo_camera(pose)
    scene.update(0.0, cam)
    return np.asarray(scene.render(cam, *RES, renderer="xla")["color"])


@pytest.fixture(scope="module")
def renders():
    return {
        "exact": _render(cloud_shape_interp=False),
        "k4": _render(cloud_shape_interp=True, cloud_shape_knots=4),
        "k16": _render(cloud_shape_interp=True, cloud_shape_knots=16),
        "k32": _render(cloud_shape_interp=True, cloud_shape_knots=32),
    }


def _mean_dev(a, b):
    return float(np.abs(a - b).mean())


@pytest.mark.slow
def test_knots_converge_toward_exact(renders):
    d4 = _mean_dev(renders["k4"], renders["exact"])
    d16 = _mean_dev(renders["k16"], renders["exact"])
    d32 = _mean_dev(renders["k32"], renders["exact"])
    assert d16 < d4, (d4, d16)
    assert d32 <= d16 * 1.05, (d16, d32)  # monotone within noise


@pytest.mark.slow
def test_k16_envelope(renders):
    """The default K=16 stays within the measured envelope at the avatar
    pose (the benchmark camera)."""
    d16 = _mean_dev(renders["k16"], renders["exact"])
    assert d16 < 0.03, d16


def test_interp_off_is_default():
    from godot_atmosphere_shader_tpu.models.params import VariantConfig

    assert VariantConfig().cloud_shape_interp is False
