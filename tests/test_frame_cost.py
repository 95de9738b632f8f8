"""Exact-loop cost accounting (``utils/profiling.frame_cost``).

XLA's HLO cost analysis counts a ``while`` body ONCE, not ×trip-count
(measured: an 8-step and a 64-step march lower to identical reported
flops), so the bench's MFU/roofline fields were undercounting march work.
``frame_cost`` recovers exact counts by lowering the trace with unrolled
marches at step counts 1 and 2 and extrapolating the affine model
``total = base + (steps-1)·per_step``.  These tests pin:

* the model scales with step count (the bug it fixes),
* the affine extrapolation matches a directly-unrolled lowering,
* ``VariantConfig.march_unroll`` is semantically inert (same pixels).
"""

import dataclasses

import numpy as np
import pytest

from godot_atmosphere_shader_tpu.models.demo import build_demo_scene, demo_camera
from godot_atmosphere_shader_tpu.utils.profiling import frame_cost

RES = (16, 32)


def _scene_parts(variant, steps=None):
    scene = build_demo_scene(variant=variant, procedural=True)
    if steps is not None:
        for a in scene.atmospheres:
            a.set_custom_shader(dataclasses.replace(
                a.config, atmosphere_steps=steps))
    atmos = tuple(a.build_params() for a in scene.atmospheres)
    cfgs = tuple(a.config for a in scene.atmospheres)
    return scene, atmos, cfgs


def test_cost_scales_with_step_count():
    scene, atmos, cfgs = _scene_parts("v1_no_clouds", steps=8)
    c8 = frame_cost(atmos, cfgs, demo_camera("exterior"), scene.opaque, *RES)
    scene, atmos, cfgs = _scene_parts("v1_no_clouds", steps=16)
    c16 = frame_cost(atmos, cfgs, demo_camera("exterior"), scene.opaque, *RES)
    per_step = c16["breakdown"]["atmo_step"]["flops"]
    assert per_step > 0
    assert c16["flops_per_pixel"] > c8["flops_per_pixel"]
    # affine in the step count: the same per-step coefficient explains both
    assert c16["flops_per_pixel"] - c8["flops_per_pixel"] == pytest.approx(
        8 * per_step, rel=1e-6)


def test_affine_model_matches_direct_unroll():
    """Extrapolated cost ≈ the cost of a trace actually unrolled to the
    target step count (5 steps keeps the direct lowering cheap).

    The direct unroll is a hair LOWER: XLA CSEs loop-invariant work across
    the unrolled iterations (measured 30 flops/px of 1494 here), work the
    rolled loop — the thing that actually executes — re-runs every
    iteration.  So assert direct ≤ affine and within a few %."""
    scene, atmos, cfgs = _scene_parts("v1_no_clouds", steps=5)
    cam = demo_camera("exterior")
    got = frame_cost(atmos, cfgs, cam, scene.opaque, *RES)

    direct_cfgs = tuple(dataclasses.replace(c, march_unroll=True)
                        for c in cfgs)
    direct = frame_cost(atmos, direct_cfgs, cam, scene.opaque, *RES,
                        exact_loops=False)
    assert direct["flops_per_pixel"] <= got["flops_per_pixel"] * (1 + 1e-6)
    assert got["flops_per_pixel"] == pytest.approx(
        direct["flops_per_pixel"], rel=0.05)
    assert got["transcendentals_per_pixel"] == pytest.approx(
        direct["transcendentals_per_pixel"], rel=0.05)


def test_march_unroll_is_semantically_inert():
    """march_unroll is cost-analysis instrumentation: same pixels to float
    rounding (not bitwise — XLA reassociates fma contraction across the
    unrolled iterations; measured ≤7.5e-7 at 0.7% of pixels)."""
    scene, _, _ = _scene_parts("clouds")
    cam = demo_camera("exterior")
    for a in scene.atmospheres:
        a.set_custom_shader(dataclasses.replace(
            a.config, march_unroll=True, atmosphere_steps=2, cloud_steps=2))
    scene2, _, _ = _scene_parts("clouds")
    for a in scene2.atmospheres:
        a.set_custom_shader(dataclasses.replace(
            a.config, atmosphere_steps=2, cloud_steps=2))
    unrolled = np.asarray(scene.render(cam, *RES, renderer="xla")["color"])
    rolled = np.asarray(scene2.render(cam, *RES, renderer="xla")["color"])
    np.testing.assert_allclose(unrolled, rolled, atol=1e-5)


def test_cloud_step_coefficient_separates():
    scene, atmos, cfgs = _scene_parts("clouds")
    cam = demo_camera("exterior")
    c = frame_cost(atmos, cfgs, cam, scene.opaque, *RES)
    br = c["breakdown"]
    # both knobs resolve to a positive per-step cost (with the fast
    # profile's knot interpolation the cloud step is CHEAPER than the v2
    # atmosphere step's GL-8 quadrature — the interp design moved the
    # noise out of the loop, which is the point)
    assert br["cloud_step"]["flops"] > 0
    assert br["atmo_step"]["flops"] > 0
    assert br["cloud_steps"] == cfgs[0].cloud_steps
    assert br["atmo_steps"] == cfgs[0].atmosphere_steps
