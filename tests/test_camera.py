"""Camera conventions: reverse-Z NDC, ray generation, depth reconstruction."""

import jax.numpy as jnp
import numpy as np

from godot_atmosphere_shader_tpu.utils.camera import (
    Camera, background_depth, linear_depth_from_buffer, look_at,
    nonlinear_depth_from_view_z, projection_matrix, rigid_inverse,
    transform_point, view_ray_dirs, world_ray_dirs)
from godot_atmosphere_shader_tpu.utils.vecmath import Vec3, vec3


def test_projection_depth_range_reverse_z():
    cam = Camera.create(fov_y_deg=70.0, near=0.1, far=800.0)
    p = np.asarray(projection_matrix(cam, aspect=1.0, reverse_z=True))
    for z_view, expected in ((-0.1, 1.0), (-800.0, 0.0)):
        clip = p @ np.array([0.0, 0.0, z_view, 1.0])
        np.testing.assert_allclose(clip[2] / clip[3], expected, atol=1e-5)


def test_projection_depth_range_standard_z():
    cam = Camera.create(fov_y_deg=70.0, near=0.1, far=800.0)
    p = np.asarray(projection_matrix(cam, aspect=1.0, reverse_z=False))
    for z_view, expected in ((-0.1, 0.0), (-800.0, 1.0)):
        clip = p @ np.array([0.0, 0.0, z_view, 1.0])
        np.testing.assert_allclose(clip[2] / clip[3], expected, atol=1e-4)


def test_center_ray_is_forward():
    eye = (5.0, 3.0, 9.0)
    target = (0.0, 0.0, 0.0)
    cam = Camera.create(look_at(eye, target))
    d = world_ray_dirs(cam, 9, 9)
    fwd = np.asarray(target, np.float64) - np.asarray(eye, np.float64)
    fwd /= np.linalg.norm(fwd)
    got = np.array([float(d.x[4, 4]), float(d.y[4, 4]), float(d.z[4, 4])])
    np.testing.assert_allclose(got, fwd, atol=1e-3)


def test_view_rays_match_inverse_projection():
    """Ray build parity with planet_atmosphere_main.gdshaderinc:131-142."""
    cam = Camera.create(fov_y_deg=70.0, near=0.1, far=800.0)
    h = w = 8
    p = np.asarray(projection_matrix(cam, aspect=w / h, reverse_z=True))
    pinv = np.linalg.inv(p)
    d = view_ray_dirs(cam, h, w)
    for (iy, ix) in [(0, 0), (3, 5), (7, 7)]:
        u = (ix + 0.5) / w
        v = (iy + 0.5) / h
        ndc = np.array([2 * u - 1, 1 - 2 * v, 0.5, 1.0])
        vc = pinv @ ndc
        expected = vc[:3] / np.linalg.norm(vc[:3])
        got = np.array([float(d.x[iy, ix]), float(d.y[iy, ix]), float(d.z[iy, ix])])
        np.testing.assert_allclose(got, expected, atol=1e-5)


def test_depth_roundtrip():
    """world point → depth buffer value → reconstructed camera distance."""
    eye = (2.0, 1.0, 5.0)
    cam = Camera.create(look_at(eye, (0.0, 0.0, 0.0)), near=0.1, far=800.0)
    h = w = 16
    d = world_ray_dirs(cam, h, w)
    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.random((h, w), np.float32) * 100.0 + 1.0)
    pts = Vec3(eye[0] + d.x * t, eye[1] + d.y * t, eye[2] + d.z * t)
    pv = transform_point(cam.world_to_view, pts)
    depth = nonlinear_depth_from_view_z(cam, pv.z, reverse_z=True)
    rec = linear_depth_from_buffer(cam, depth, h, w, reverse_z=True)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(t), rtol=2e-3)


def test_background_depth():
    assert background_depth(True) == 0.0
    assert background_depth(False) == 1.0


def test_rigid_inverse():
    m = look_at((3.0, 4.0, 5.0), (0.0, 1.0, 0.0))
    mi = rigid_inverse(m)
    # verify in numpy: XLA matmul may run at reduced precision
    prod = np.asarray(m, np.float64) @ np.asarray(mi, np.float64)
    np.testing.assert_allclose(prod, np.eye(4), atol=1e-6)
