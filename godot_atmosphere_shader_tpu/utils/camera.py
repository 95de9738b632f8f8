"""Camera model, projection matrices and per-pixel ray generation.

Re-implements the rasterizer conventions the reference shader relies on
(``/root/reference/addons/zylann.atmosphere/shaders/include/planet_atmosphere_main.gdshaderinc:84-142``):

* view space is right-handed, camera looks down ``-Z``, ``Y`` up (Godot);
* Vulkan NDC: ``x`` right and ``y`` up in ``[-1, 1]``, depth in ``[0, 1]``;
* reverse-Z by default (near plane ⇒ depth 1, far ⇒ 0), matching the
  ``REVERSE_Z`` define at ``planet_atmosphere_main.gdshaderinc:22``;
* ray directions built from the *non-w-divided* inverse-projected NDC
  (``:131-142``) — for our symmetric perspective this reduces to
  ``normalize(ndc.x·aspect/f, ndc.y/f, -1)``;
* ``linear_depth`` is the Euclidean camera→point distance (``:138``), not
  ``-z_view``.

Everything is a pytree of small arrays, so cameras can be traced, vmapped
over (flight paths) and sharded.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .vecmath import Vec3, normalize


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole camera.  ``view_to_world`` is the camera's global transform."""

    view_to_world: jnp.ndarray  # (4, 4) f32, rigid transform
    fov_y_rad: jnp.ndarray  # scalar
    near: jnp.ndarray  # scalar
    far: jnp.ndarray  # scalar

    @staticmethod
    def create(view_to_world=None, fov_y_deg: float = 70.0, near: float = 0.1,
               far: float = 800.0) -> "Camera":
        """Defaults match the demo avatar camera
        (``/root/reference/addons/zylann.atmosphere/demo/flying_avatar.tscn:11-13``)."""
        if view_to_world is None:
            view_to_world = jnp.eye(4, dtype=jnp.float32)
        # always degrees in — converting only for python floats would turn a
        # np.float32 argument into silent radians (unit change keyed on type)
        fov_y_rad = jnp.deg2rad(jnp.asarray(fov_y_deg, jnp.float32))
        if (isinstance(view_to_world, np.ndarray)
                and view_to_world.dtype == np.float64):
            # large-world cameras stay host-side float64; Scene rebases the
            # world around them before any f32 cast (DOUBLE_PRECISION analog)
            return Camera(
                view_to_world=view_to_world,
                fov_y_rad=fov_y_rad,
                near=jnp.asarray(near, jnp.float32),
                far=jnp.asarray(far, jnp.float32),
            )
        return Camera(
            view_to_world=jnp.asarray(view_to_world, jnp.float32),
            fov_y_rad=fov_y_rad,
            near=jnp.asarray(near, jnp.float32),
            far=jnp.asarray(far, jnp.float32),
        )

    @property
    def world_to_view(self) -> jnp.ndarray:
        return rigid_inverse(self.view_to_world)

    @property
    def position(self) -> Vec3:
        t = self.view_to_world[:3, 3]
        return Vec3(t[0], t[1], t[2])


def look_at(eye, target, up=(0.0, 1.0, 0.0)) -> jnp.ndarray:
    """Camera (view→world) transform looking from ``eye`` toward ``target``.

    When any input is a float64 numpy array the matrix is computed and
    returned in host numpy float64 — the large-world path (the TPU-native
    analog of the reference's ``DOUBLE_PRECISION`` define,
    ``planet_atmosphere_main.gdshaderinc:24-25``) needs the camera position
    at full precision so :class:`~..models.scene.Scene` can rebase the world
    around it before anything is cast to f32 for the device.
    """
    if any(isinstance(a, np.ndarray) and a.dtype == np.float64
           for a in (eye, target, up)):
        eye = np.asarray(eye, np.float64)
        fwd = np.asarray(target, np.float64) - eye
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, np.asarray(up, np.float64))
        right = right / np.linalg.norm(right)
        true_up = np.cross(right, fwd)
        m = np.eye(4)
        m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, true_up, -fwd, eye
        return m
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = target - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, up)
    right = right / jnp.linalg.norm(right)
    true_up = jnp.cross(right, fwd)
    m = jnp.eye(4, dtype=jnp.float32)
    # camera basis: X=right, Y=up, Z=-forward (looks down -Z)
    m = m.at[:3, 0].set(right)
    m = m.at[:3, 1].set(true_up)
    m = m.at[:3, 2].set(-fwd)
    m = m.at[:3, 3].set(eye)
    return m


def rigid_inverse(m: jnp.ndarray) -> jnp.ndarray:
    """Fast inverse of a rigid (rotation+translation) 4×4 transform.

    The translation is computed with explicit scalar arithmetic: tiny jnp
    matmuls run on the MXU at reduced (bf16) default precision, which is not
    acceptable for camera/planet transforms.
    """
    r = m[:3, :3]
    t = m[:3, 3]
    rt = r.T
    nt = -(rt[:, 0] * t[0] + rt[:, 1] * t[1] + rt[:, 2] * t[2])
    out = jnp.eye(4, dtype=m.dtype)
    out = out.at[:3, :3].set(rt)
    out = out.at[:3, 3].set(nt)
    return out


def projection_coeffs(cam: Camera, reverse_z: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``(A, B)`` of the projection's depth row: ``clip_z = A·z_view + B·w``.

    Reverse-Z (Godot 4.3 / Vulkan): near ⇒ depth 1, far ⇒ 0.
    """
    n, f = cam.near, cam.far
    if reverse_z:
        a = n / (f - n)
        b = n * f / (f - n)
    else:
        a = -f / (f - n)
        b = -f * n / (f - n)
    return a, b


def projection_matrix(cam: Camera, aspect: float, reverse_z: bool = True) -> jnp.ndarray:
    fy = 1.0 / jnp.tan(cam.fov_y_rad * 0.5)
    a, b = projection_coeffs(cam, reverse_z)
    p = jnp.zeros((4, 4), jnp.float32)
    p = p.at[0, 0].set(fy / aspect)
    p = p.at[1, 1].set(fy)
    p = p.at[2, 2].set(a)
    p = p.at[2, 3].set(b)
    p = p.at[3, 2].set(-1.0)
    return p


def pixel_ndc(height: int, width: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel NDC xy at pixel centers; (0,0) is the top-left pixel."""
    u = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    v = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    ndc_x = jnp.broadcast_to(2.0 * u - 1.0, (height, width))
    ndc_y = jnp.broadcast_to((1.0 - 2.0 * v)[:, None], (height, width))
    return ndc_x, ndc_y


def view_ray_dirs(cam: Camera, height: int, width: int) -> Vec3:
    """Normalized per-pixel ray directions in **view space**.

    Equivalent to the non-w-divided ``INV_PROJECTION_MATRIX * ndc`` of
    ``planet_atmosphere_main.gdshaderinc:131-142``.
    """
    aspect = width / height
    fy = 1.0 / jnp.tan(cam.fov_y_rad * 0.5)
    ndc_x, ndc_y = pixel_ndc(height, width)
    return normalize(Vec3(ndc_x * (aspect / fy), ndc_y / fy,
                          jnp.full((height, width), -1.0, jnp.float32)))


def world_ray_dirs(cam: Camera, height: int, width: int) -> Vec3:
    """Per-pixel ray directions rotated into world space."""
    d = view_ray_dirs(cam, height, width)
    r = cam.view_to_world[:3, :3]
    return Vec3(
        r[0, 0] * d.x + r[0, 1] * d.y + r[0, 2] * d.z,
        r[1, 0] * d.x + r[1, 1] * d.y + r[1, 2] * d.z,
        r[2, 0] * d.x + r[2, 1] * d.y + r[2, 2] * d.z,
    )


def transform_point(m: jnp.ndarray, p: Vec3) -> Vec3:
    """Apply a 4×4 affine transform to a Vec3 of arrays (w assumed 1)."""
    return Vec3(
        m[0, 0] * p.x + m[0, 1] * p.y + m[0, 2] * p.z + m[0, 3],
        m[1, 0] * p.x + m[1, 1] * p.y + m[1, 2] * p.z + m[1, 3],
        m[2, 0] * p.x + m[2, 1] * p.y + m[2, 2] * p.z + m[2, 3],
    )


def transform_dir(m: jnp.ndarray, d: Vec3) -> Vec3:
    """Apply only the linear part (w = 0), as ``view_to_model * vec4(dir, 0)``."""
    return Vec3(
        m[0, 0] * d.x + m[0, 1] * d.y + m[0, 2] * d.z,
        m[1, 0] * d.x + m[1, 1] * d.y + m[1, 2] * d.z,
        m[2, 0] * d.x + m[2, 1] * d.y + m[2, 2] * d.z,
    )


def linear_depth_from_buffer(cam: Camera, nonlinear_depth: jnp.ndarray,
                             height: int, width: int,
                             reverse_z: bool = True) -> jnp.ndarray:
    """Euclidean camera→point distance from a nonlinear depth buffer.

    Mirrors the fragment reconstruction at
    ``planet_atmosphere_main.gdshaderinc:128-138``: NDC → view (w-divide) →
    distance.  Distance is rotation-invariant so the world transform drops out.
    """
    aspect = width / height
    fy = 1.0 / jnp.tan(cam.fov_y_rad * 0.5)
    a, b = projection_coeffs(cam, reverse_z)
    ndc_x, ndc_y = pixel_ndc(height, width)
    # inverse projection of (ndc, d, 1): xyz = (x·aspect/f, y/f, -1), w = (d + a)/b
    w = (nonlinear_depth + a) / b
    inv_w = 1.0 / w
    px = ndc_x * (aspect / fy) * inv_w
    py = (ndc_y / fy) * inv_w
    pz = -inv_w
    return jnp.sqrt(px * px + py * py + pz * pz)


def nonlinear_depth_from_view_z(cam: Camera, z_view: jnp.ndarray,
                                reverse_z: bool = True) -> jnp.ndarray:
    """Encode a (negative) view-space z into the nonlinear depth buffer value."""
    a, b = projection_coeffs(cam, reverse_z)
    return (a * z_view + b) / (-z_view)


def background_depth(reverse_z: bool = True) -> float:
    """Depth-buffer clear value (the far plane)."""
    return 0.0 if reverse_z else 1.0
