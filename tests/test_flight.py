"""Flying camera + flight paths (demo avatar analog) and the default scene."""

import math

import numpy as np

from godot_atmosphere_shader_tpu.utils.flight import (FlyCamera, approach_path,
                                                      orbit_path)


def test_fly_camera_forward():
    fc = FlyCamera(position=(0.0, 0.0, 10.0), speed=60.0)
    fc.move((0.0, 0.0, -1.0), dt=1.0)  # forward = -z local
    np.testing.assert_allclose(fc.position, [0.0, 0.0, -50.0], atol=1e-6)


def test_fly_camera_yaw():
    fc = FlyCamera(speed=1.0)
    fc.look(math.pi / 2, 0.0)  # yaw 90° left → forward becomes -x
    fc.move((0.0, 0.0, -1.0), dt=1.0)
    np.testing.assert_allclose(fc.position, [-1.0, 0.0, 0.0], atol=1e-6)


def test_pitch_clamped():
    fc = FlyCamera()
    fc.look(0.0, 10.0)  # way past vertical
    assert fc.pitch == math.pi / 2
    fc.look(0.0, -20.0)
    assert fc.pitch == -math.pi / 2


def test_camera_matrix_orthonormal():
    fc = FlyCamera(position=(3.0, 4.0, 5.0))
    fc.look(0.7, -0.3)
    cam = fc.camera()
    m = np.asarray(cam.view_to_world)
    r = m[:3, :3]
    np.testing.assert_allclose(r.T @ r, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(m[:3, 3], [3.0, 4.0, 5.0], atol=1e-6)


def test_orbit_path_geometry():
    cams = list(orbit_path(radius=200.0, height=50.0, frames=8))
    assert len(cams) == 8
    for cam in cams:
        eye = np.asarray(cam.view_to_world)[:3, 3]
        np.testing.assert_allclose(np.hypot(eye[0], eye[2]), 200.0, rtol=1e-5)
        np.testing.assert_allclose(eye[1], 50.0, rtol=1e-5)


def test_approach_path_endpoints():
    cams = list(approach_path((0, 0, 400), (0, 104, 0), frames=5))
    e0 = np.asarray(cams[0].view_to_world)[:3, 3]
    e1 = np.asarray(cams[-1].view_to_world)[:3, 3]
    np.testing.assert_allclose(e0, [0, 0, 400], atol=1e-4)
    np.testing.assert_allclose(e1, [0, 104, 0], atol=1e-4)


def test_default_node_scene_renders():
    from godot_atmosphere_shader_tpu.models.demo import default_node_scene
    from godot_atmosphere_shader_tpu.utils.camera import Camera, look_at

    scene = default_node_scene()
    # defaults from planet_atmosphere.tscn:8-15
    atmo = scene.atmospheres[0]
    assert float(atmo.get_shader_parameter("u_density")) == 10.0
    assert float(atmo.get_shader_parameter("u_scattering_strength")) == 0.5
    cam = Camera.create(look_at((0.0, 0.0, 4.0), (0.0, 0.0, 0.0)), near=0.01,
                        far=100.0)
    scene.update(0.0, cam)
    out = scene.render(cam, 32, 32)
    img = np.asarray(out["color"])
    assert np.isfinite(img).all() and img.max() > 0.0
