"""Dynamic-knot interpolation (``VariantConfig.knot_dynamic``, ROADMAP #13).

The megakernel parks each interp field's knot planes in a VMEM stack and the
march body loads the two live knots per step by dynamic index (2 loads + 2
scalar-weight fmas) instead of folding the K+1-term hat sum (K+1 plane
fmas).  Only two hat weights are ever nonzero and the step phase is a
per-step scalar, so the result must match the hat path to float rounding
(fma-contraction order is the only legitimate difference; measured ≤7e-7 at
demo scale on both interpret and compiled paths).
"""

import dataclasses

import numpy as np
import pytest

from godot_atmosphere_shader_tpu.models.demo import build_demo_scene, demo_camera
from godot_atmosphere_shader_tpu.ops.pallas.megakernel import render_frame_pallas


def _render(dyn, lod, covlod, shape_interp=True):
    scene = build_demo_scene(variant="clouds", procedural=True)
    cam = demo_camera("avatar")
    scene.update(0.0, cam)
    atmo = scene.atmospheres[0]
    cfg = dataclasses.replace(
        atmo.config, cloud_coverage_interp=True, cloud_coverage_knots=8,
        cloud_shape_interp=shape_interp, cloud_shape_knots=4, cloud_steps=8,
        cloud_lod=lod, cloud_coverage_lod=covlod, knot_dynamic=dyn)
    out = render_frame_pallas(atmo.build_params(), cfg, cam, scene.opaque,
                              32, 128, block=(16, 128), interpret=True)
    return np.asarray(out["color"])


@pytest.mark.slow
@pytest.mark.parametrize("lod,covlod", [(1, 1), (2, 2)])
def test_knot_dynamic_matches_hat(lod, covlod):
    hat = _render(False, lod, covlod)
    dyn = _render(True, lod, covlod)
    assert np.isfinite(dyn).all()
    # same two live knot terms, different fma contraction only
    np.testing.assert_allclose(dyn, hat, atol=5e-6, rtol=1e-5)


@pytest.mark.slow
def test_knot_dynamic_coverage_only():
    # the procedural flagship profile: coverage interp without shape interp
    hat = _render(False, 2, 2, shape_interp=False)
    dyn = _render(True, 2, 2, shape_interp=False)
    np.testing.assert_allclose(dyn, hat, atol=5e-6, rtol=1e-5)


def test_knot_dynamic_xla_path_matches_hat():
    """Since r5 the XLA path honors ``knot_dynamic`` too (dynamic_index
    over the stacked knot planes) — both so the fallback renderer executes
    the same arithmetic as the kernel and so the cost model's inventory is
    knot-faithful (``frame_cost``, VERDICT r4 next #3).  Same rounding-only
    envelope as the megakernel pair above."""
    import jax.numpy as jnp

    from godot_atmosphere_shader_tpu.render.renderer import render_frame

    scene = build_demo_scene(variant="clouds", procedural=True)
    cam = demo_camera("avatar")
    scene.update(0.0, cam)
    atmo = scene.atmospheres[0]
    outs = {}
    for dyn in (False, True):
        cfg = dataclasses.replace(
            atmo.config, cloud_coverage_interp=True, cloud_coverage_knots=8,
            cloud_shape_interp=True, cloud_shape_knots=4, cloud_steps=8,
            cloud_lod=1, cloud_coverage_lod=1, knot_dynamic=dyn)
        out = render_frame((atmo.build_params(),), (cfg,), cam, scene.opaque,
                           32, 128)
        outs[dyn] = np.asarray(out["color"])
    assert np.isfinite(outs[True]).all()
    np.testing.assert_allclose(outs[True], outs[False], atol=5e-6, rtol=1e-5)
