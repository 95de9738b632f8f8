"""Multi-chip sharding: a row-sharded render must bit-match single-chip.

Pixel parallelism has zero cross-chip traffic, so exact equality is the
correct bar (SURVEY.md §4 item 4).  Runs on an 8-device virtual CPU mesh.
"""

import jax
import numpy as np
import pytest

from godot_atmosphere_shader_tpu.models.demo import build_demo_scene, demo_camera
from godot_atmosphere_shader_tpu.parallel.sharding import (make_mesh,
                                                           render_frame_sharded)
from godot_atmosphere_shader_tpu.render.renderer import render_frame


@pytest.fixture(scope="module")
def demo():
    scene = build_demo_scene(variant="clouds", procedural=True)
    cam = demo_camera("space")
    scene.update(0.0, cam)
    atmo = scene.atmospheres[0]
    return atmo.build_params(), atmo.config, cam, scene.opaque


def test_eight_virtual_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_sharded_matches_single_chip(demo):
    params, config, cam, opaque = demo
    h, w = 64, 64
    single = render_frame((params,), (config,), cam, opaque, h, w)["color"]
    mesh = make_mesh()
    sharded = render_frame_sharded((params,), (config,), cam, opaque, h, w, mesh)
    # the algorithm has zero cross-pixel dependencies, but XLA fuses the
    # slice-shaped program slightly differently (fma contraction), so allow
    # ulp-level drift rather than demanding bit equality
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               atol=1e-6, rtol=1e-6)


def test_sharded_rejects_indivisible_height(demo):
    params, config, cam, opaque = demo
    mesh = make_mesh()
    with pytest.raises(ValueError):
        render_frame_sharded((params,), (config,), cam, opaque, 30, 64, mesh)


@pytest.mark.slow
def test_graft_entry_single_and_multichip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 256, 3)
    assert bool(np.isfinite(np.asarray(out)).all())
    ge.dryrun_multichip(8)
