"""Large-world (camera-relative) rendering — the TPU-native analog of the
reference's ``DOUBLE_PRECISION`` define
(``planet_atmosphere_main.gdshaderinc:24-25``).

The reference compiles the shader with 64-bit planet/camera positions on
double-precision engine builds; here the Scene instead rebases every
device-bound world position around the camera in host float64 each frame, so
the f32 march never sees a large coordinate.  The tests build an Earth-scale
planet (R = 6.371e6) and check the property that actually matters:
**translation invariance** — rendering the identical scene placed 3e7 units
from the world origin must produce the same frame as at the origin.  Without
the rebase, f32 world coordinates at 3e7 quantize to ±2 units and the march
visibly bands; with it, the frames match to normal f32 noise.
"""

import dataclasses

import numpy as np
import pytest

from godot_atmosphere_shader_tpu.models.scene import (
    LARGE_WORLD_THRESHOLD, Node3D, PlanetAtmosphere, Scene)
from godot_atmosphere_shader_tpu.render.opaque import OpaqueScene
from godot_atmosphere_shader_tpu.utils.camera import Camera, look_at

R_EARTH = 6.371e6
H_ATMO = 1.0e5
SIZE = (48, 64)


def _earth_scene(offset, large_world=None):
    """Earth-scale planet at ``offset``; camera 60 km up looking at the limb."""
    offset = np.asarray(offset, np.float64)
    sun = Node3D(position=offset + np.array([1.5e8, 0.0, 0.0]))
    atmo = PlanetAtmosphere(
        planet_radius=R_EARTH, atmosphere_height=H_ATMO, sun=sun,
        custom_shader="no_clouds", position=offset,
        density=0.005, scattering_strength=1.0)
    opaque = OpaqueScene.create(
        spheres=[(np.asarray(offset, np.float64), R_EARTH, (0.25, 0.22, 0.2))],
        light_dir=(-1.0, 0.0, 0.0), sky_color=(0.0, 0.0, 0.0))
    scene = Scene([atmo], opaque, large_world=large_world)
    # float64 eye/target keep full precision through look_at and Camera.create
    eye = offset + np.array([0.0, R_EARTH + 6.0e4, 0.0])
    target = offset + np.array([2.0e6, R_EARTH - 1.0e5, 0.0])
    cam = Camera.create(look_at(eye, target), fov_y_deg=70.0,
                        near=10.0, far=1.0e8)
    return scene, cam


def _render(offset, large_world=None):
    scene, cam = _earth_scene(offset, large_world=large_world)
    scene.update(0.0, cam)
    out = scene.render(cam, *SIZE, renderer="xla")
    return np.asarray(out["color"]), np.asarray(out["alpha"])


def test_auto_activation():
    scene, cam = _earth_scene((0.0, 0.0, 0.0))
    cam_pos = np.asarray(cam.view_to_world)[:3, 3]
    assert np.max(np.abs(cam_pos)) > LARGE_WORLD_THRESHOLD
    assert scene._large_world_active(cam_pos)
    small = Scene([PlanetAtmosphere()], None)
    assert not small._large_world_active(np.zeros(3))


def test_camera_is_rebased_to_origin():
    scene, cam = _earth_scene((3.0e7, 0.0, 0.0))
    scene.update(0.0, cam)
    cam_rel, opaque_rel = scene._rebased_view(cam)
    t = np.asarray(cam_rel.view_to_world)[:3, 3]
    assert np.max(np.abs(t)) == 0.0  # exact: origin IS the camera position
    # opaque sphere lands near the camera, not at 3e7
    assert np.max(np.abs(np.asarray(opaque_rel.sphere_centers))) < 2 * R_EARTH
    # frame_state's world→model maps the camera-relative planet to model space
    fs = np.asarray(scene.atmospheres[0]._params.frame_state)
    w2m = fs[3:19].reshape(4, 4)
    planet_rel = np.linalg.inv(w2m)[:3, 3]
    assert np.max(np.abs(planet_rel)) < 2 * R_EARTH


def test_translation_invariance_at_3e7():
    rgb0, a0 = _render((0.0, 0.0, 0.0))
    rgb1, a1 = _render((3.0e7, 1.0e7, -2.0e7))
    assert np.isfinite(rgb1).all()
    # the atmosphere is actually in frame
    assert float(a0.mean()) > 0.05
    # camera-relative: moving the whole system 3e7 units leaves the frame
    # unchanged — the rebased relative geometry is identical in f64, so the
    # f32 render is too (measured: bitwise equal; bound allows platform slop)
    assert float(np.abs(rgb1 - rgb0).max()) < 1e-5


def test_rebase_beats_raw_f32():
    """Disabling the rebase at 3e7 must visibly corrupt the frame — this
    pins that the test above is actually exercising the mechanism."""
    off = (2.56e8, 1.0e8, -1.6e8)  # f32 spacing ~16-32 m out here
    rgb0, _ = _render((0.0, 0.0, 0.0), large_world=True)
    rgb_lw, _ = _render(off, large_world=True)
    rgb_raw, _ = _render(off, large_world=False)
    err_lw = float(np.abs(rgb_lw - rgb0).mean())
    err_raw = float(np.abs(rgb_raw - rgb0).mean())
    # measured: err_raw ≈ 1.4e-5 mean (quantized march), err_lw = 0.0 exactly
    assert err_raw > 10.0 * max(err_lw, 1e-7)


def test_flight_rebase_single_origin():
    """Flight sequences rebase by the first frame's camera; frames stay
    finite and the two-frame sequence matches per-frame renders."""
    scene, cam = _earth_scene((3.0e7, 0.0, 0.0))
    m0 = np.asarray(cam.view_to_world, np.float64)
    m1 = m0.copy()
    m1[:3, 3] += np.array([200.0, 0.0, 0.0])  # 200 m hop
    stack = np.stack([m0, m1])
    out = scene.render_flight(cam, [0.0, 0.1], *SIZE,
                              cam_transforms=stack, renderer="xla")
    arr = np.asarray(out["color"])
    assert np.isfinite(arr).all()
    assert arr.shape[0] == 2
    # consecutive frames from a 200 m hop differ smoothly, not catastrophically
    assert float(np.abs(arr[1] - arr[0]).mean()) < 5e-2


def test_small_scenes_unaffected():
    """Demo-scale scenes never enter the rebase path (auto-off)."""
    atmo = PlanetAtmosphere(planet_radius=100.0, atmosphere_height=8.0,
                            custom_shader="no_clouds")
    scene = Scene([atmo], OpaqueScene.create(
        spheres=[((0.0, 0.0, 0.0), 100.0, (0.3, 0.3, 0.3))]))
    cam = Camera.create(look_at((0.0, 150.0, 420.0), (0.0, 0.0, 0.0)),
                        far=2000.0)
    scene.update(0.0, cam)
    assert scene._rebase_origin is None
    cam_out, opaque_out = scene._rebased_view(cam)
    assert cam_out is cam and opaque_out is scene.opaque
