"""Megakernel parity: the fused Pallas path must match the XLA path.

On CPU the kernel runs in Pallas interpret mode on a tiny frame; on real TPU
hardware the compiled kernel is exercised by bench.py and the TPU-side
parity check in tools/tpu_checks.py.
"""

import jax
import numpy as np
import pytest

from godot_atmosphere_shader_tpu.models.demo import build_demo_scene, demo_camera
from godot_atmosphere_shader_tpu.ops.pallas.megakernel import render_frame_pallas
from godot_atmosphere_shader_tpu.render.renderer import render_frame


def _demo(variant):
    scene = build_demo_scene(variant=variant, procedural=True)
    cam = demo_camera("space")
    scene.update(0.0, cam)
    atmo = scene.atmospheres[0]
    return atmo.build_params(), atmo.config, cam, scene.opaque


@pytest.mark.parametrize("variant", [
    "no_clouds",
    pytest.param("clouds", marks=pytest.mark.slow),  # interpret-mode cloud march
])
def test_megakernel_matches_xla(variant):
    params, config, cam, opaque = _demo(variant)
    h, w = 16, 128
    ref = np.asarray(render_frame((params,), (config,), cam, opaque, h, w)["color"])
    out = render_frame_pallas(params, config, cam, opaque, h, w,
                              block=(8, 128), interpret=True)
    got = np.asarray(out["color"])
    assert np.isfinite(got).all()
    # same jnp ops on both paths → tight agreement (fusion reorder only)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


def test_megakernel_rejects_lut_mode():
    import dataclasses

    params, config, cam, opaque = _demo("no_clouds")
    bad = dataclasses.replace(config, od_mode="lut")
    with pytest.raises(ValueError):
        render_frame_pallas(params, bad, cam, opaque, 8, 128, interpret=True)


@pytest.mark.slow
def test_megakernel_rejects_texture_clouds():
    scene = build_demo_scene(variant="clouds", procedural=False)
    cam = demo_camera("space")
    scene.update(0.0, cam)
    atmo = scene.atmospheres[0]
    with pytest.raises(ValueError):
        render_frame_pallas(atmo.build_params(), atmo.config, cam, scene.opaque,
                            8, 128, interpret=True)
