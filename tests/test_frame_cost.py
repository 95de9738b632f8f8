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


def test_jaxpr_cost_exact_on_known_function():
    """The inventory is exact where counts are hand-computable."""
    import jax
    import jax.numpy as jnp

    from godot_atmosphere_shader_tpu.utils.profiling import jaxpr_cost

    def f(x):
        return jnp.exp(x * 2.0 + 1.0)

    c = jaxpr_cost(jax.make_jaxpr(f)(jnp.ones(8, jnp.float32)))
    assert c["flops"] == 16          # mul + add, 8 lanes each
    assert c["transcendentals"] == 8  # exp
    assert c["unknown"] == {}


def test_jaxpr_cost_scan_body_multiplied_by_length():
    """scan bodies count ×length — the property that makes the trace
    inventory exact for the march loops (fori_loop with static bounds
    lowers to scan), where XLA's compiled cost model counts once."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from godot_atmosphere_shader_tpu.utils.profiling import jaxpr_cost

    def body(c, x):
        return c * x + 1.0, None

    def f(x):
        return lax.scan(body, jnp.float32(0.0), x)[0]

    c5 = jaxpr_cost(jax.make_jaxpr(f)(jnp.ones(5, jnp.float32)))
    c9 = jaxpr_cost(jax.make_jaxpr(f)(jnp.ones(9, jnp.float32)))
    assert c9["flops"] - c5["flops"] == 4 * 2  # 2 flops per iteration
    assert c5["unknown"] == {}


def test_jaxpr_cost_cond_takes_max_branch():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from godot_atmosphere_shader_tpu.utils.profiling import jaxpr_cost

    def f(p, x):
        return lax.cond(p, lambda v: v * v + v, lambda v: v + 1.0, x)

    c = jaxpr_cost(jax.make_jaxpr(f)(True, jnp.ones(8, jnp.float32)))
    assert c["flops"] == 16  # expensive branch: mul + add over 8 lanes
    assert c["unknown"] == {}


def test_trace_extrapolation_matches_full_config():
    """On the trace platform the affine extrapolation is exact by
    construction: the full-config trace's scans carry their lengths, so
    walking it directly must equal base + Σ(steps−1)·per_step.  This is
    the consistency proof that the roofline's flops_per_pixel describes
    the configured march, not a 1-step proxy."""
    import jax

    from godot_atmosphere_shader_tpu.render.renderer import _render_jit
    from godot_atmosphere_shader_tpu.utils.profiling import jaxpr_cost

    scene, atmos, cfgs = _scene_parts("clouds")
    cam = demo_camera("exterior")
    got = frame_cost(atmos, cfgs, cam, scene.opaque, *RES, platform="trace")
    assert got["cost_platform"] == "trace"
    assert got["unknown_ops"] == {}

    traced = _render_jit.trace(atmos, cfgs, cam, scene.opaque, *RES)
    full = jaxpr_cost(traced.jaxpr)
    n = RES[0] * RES[1]
    assert got["flops_per_pixel"] == pytest.approx(full["flops"] / n,
                                                   rel=1e-9)
    assert got["transcendentals_per_pixel"] == pytest.approx(
        full["transcendentals"] / n, rel=1e-9)
    assert full["unknown"] == {}


def test_trace_inventory_prices_every_primitive():
    """unknown_ops stays empty across the shading-model space the bench
    exercises (v1, v2+clouds+RM lighting, texture mode) — a new primitive
    entering the trace must be priced, not silently dropped."""
    for variant, procedural in (("v1_no_clouds", True),
                                ("clouds_high_rm", True),
                                ("clouds", False)):
        scene = build_demo_scene(variant=variant, procedural=procedural)
        atmos = tuple(a.build_params() for a in scene.atmospheres)
        cfgs = tuple(a.effective_config() for a in scene.atmospheres)
        c = frame_cost(atmos, cfgs, demo_camera("exterior"), scene.opaque,
                       *RES, platform="trace")
        assert c["unknown_ops"] == {}, (variant, c["unknown_ops"])


def test_opaque_only_trace_splits_the_base():
    """bench's scheduled-work floor scales the IN-KERNEL base by tile
    coverage (tile_cull skips ray setup/shell tests/knot evals in culled
    tiles) and keeps only the truly frame-wide work — opaque pass +
    composite, measured by tracing with zero atmospheres — unscaled.
    Pins that the zero-atmosphere trace works and never exceeds the full
    shading base (bench min()-clamps, but a violation would mean the
    opaque trace counts work the full frame doesn't — a model bug).  How
    MUCH of the base is in-kernel is config-dependent: measured 395 of
    12260 flops/px on the rm multi-planet scene (where the split moved
    mfu_device from an impossible 1.26 to ~0.4) but 395 of 574 on this
    cheap procedural-clouds scene."""
    scene, atmos, cfgs = _scene_parts("clouds")
    cam = demo_camera("exterior")
    op = frame_cost((), (), cam, scene.opaque, *RES, exact_loops=False,
                    platform="trace")
    assert op["flops_per_pixel"] > 0
    assert op["unknown_ops"] == {}
    full = frame_cost(atmos, cfgs, cam, scene.opaque, *RES,
                      platform="trace")
    assert op["flops_per_pixel"] <= full["breakdown"]["base"]["flops"]


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
