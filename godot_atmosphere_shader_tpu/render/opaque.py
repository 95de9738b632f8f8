"""Analytic opaque pass: the stand-in for Godot's rasterized scene.

The reference composites its transparent atmosphere against the engine's
opaque pass via the hardware depth buffer (``SURVEY.md §2.2``).  Our demo
scenes contain only spheres, boxes and a sky
(``/root/reference/addons/zylann.atmosphere/demo/planet_atmosphere_test.tscn``),
so a tiny analytic raytracer — fully vectorized per pixel, no rasterization —
produces both the color and the (reverse-Z) nonlinear depth buffer the
atmosphere pass consumes.  Ray-traced primaries are the idiomatic TPU
replacement for a rasterizer here: same elementwise math as the raymarcher,
zero divergence.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.camera import (Camera, background_depth,
                            nonlinear_depth_from_view_z, transform_point,
                            transform_dir, world_ray_dirs)
from ..utils.vecmath import Vec3, normalize, ray_box, ray_sphere


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OpaqueScene:
    """Spheres + boxes + directional light, as stacked arrays."""

    sphere_centers: jnp.ndarray  # (S, 3)
    sphere_radii: jnp.ndarray  # (S,)
    sphere_albedos: jnp.ndarray  # (S, 3) linear
    sphere_unshaded: jnp.ndarray  # (S,) 1.0 ⇒ emissive/unshaded (the sun mesh)
    box_world_to_box: jnp.ndarray  # (B, 4, 4)
    box_half_sizes: jnp.ndarray  # (B, 3)
    box_albedos: jnp.ndarray  # (B, 3)
    light_dir: jnp.ndarray  # (3,) direction light travels (from sun)
    ambient: jnp.ndarray  # scalar
    sky_color: jnp.ndarray  # (3,) linear
    # procedural starfield (the demo's space-panorama analog — an actual
    # equirect texture would be a gather; hashed star glints are free):
    # 0 disables; otherwise scales star brightness
    star_intensity: jnp.ndarray = None  # scalar
    # equirect sky texture (H, W, 3) linear RGB — the real
    # PanoramaSkyMaterial (``demo/planet_atmosphere_test.tscn``
    # Sky/PanoramaSkyMaterial → ``space_background.webp``).  When set it
    # replaces sky_color + starfield on rays that miss all geometry: XLA
    # samples it bilinear (``ops/sampling.py::sample_equirect_bilinear``),
    # the megakernel through a VMEM mip pyramid
    # (``ops/pallas/texsample.py::sample_latlong``).
    panorama: jnp.ndarray = None  # (H, W, 3) or None

    @staticmethod
    def create(spheres=(), boxes=(), light_dir=(0.0, 0.0, -1.0),
               ambient=0.02, sky_color=(0.0, 0.0, 0.0),
               star_intensity=0.0, panorama=None) -> "OpaqueScene":
        """``spheres``: list of (center, radius, albedo[, unshaded]);
        ``boxes``: list of (world_to_box 4×4, half_size, albedo)."""
        import numpy as np

        if spheres:
            sc = np.array([s[0] for s in spheres], np.float32)
            sr = np.array([s[1] for s in spheres], np.float32)
            sa = np.array([s[2] for s in spheres], np.float32)
            su = np.array([float(s[3]) if len(s) > 3 else 0.0 for s in spheres],
                          np.float32)
        else:
            sc = np.zeros((0, 3), np.float32)
            sr = np.zeros((0,), np.float32)
            sa = np.zeros((0, 3), np.float32)
            su = np.zeros((0,), np.float32)
        if boxes:
            bm = np.array([b[0] for b in boxes], np.float32)
            bh = np.array([b[1] for b in boxes], np.float32)
            ba = np.array([b[2] for b in boxes], np.float32)
        else:
            bm = np.zeros((0, 4, 4), np.float32)
            bh = np.zeros((0, 3), np.float32)
            ba = np.zeros((0, 3), np.float32)
        return OpaqueScene(
            sphere_centers=jnp.asarray(sc), sphere_radii=jnp.asarray(sr),
            sphere_albedos=jnp.asarray(sa), sphere_unshaded=jnp.asarray(su),
            box_world_to_box=jnp.asarray(bm), box_half_sizes=jnp.asarray(bh),
            box_albedos=jnp.asarray(ba),
            light_dir=jnp.asarray(light_dir, jnp.float32),
            ambient=jnp.asarray(ambient, jnp.float32),
            sky_color=jnp.asarray(sky_color, jnp.float32),
            star_intensity=jnp.asarray(star_intensity, jnp.float32),
            panorama=(None if panorama is None
                      else jnp.asarray(panorama, jnp.float32)),
        )

    def rebased(self, origin, host_cache: dict = None) -> "OpaqueScene":
        """Camera-relative copy: world positions shifted by ``-origin``.

        The large-world path (DOUBLE_PRECISION analog,
        ``planet_atmosphere_main.gdshaderinc:24-25``): the subtraction runs
        host-side in float64, so geometry near the camera keeps full f32
        precision on device no matter how far from the world origin it sits.
        ``host_cache`` (optional, caller-owned) avoids refetching the device
        arrays every frame; the rebased leaves stay numpy so the upload rides
        the next jit call.
        """
        import numpy as np

        if host_cache is not None and "sc" in host_cache:
            sc, bm = host_cache["sc"], host_cache["bm"]
        else:
            sc = np.asarray(self.sphere_centers, np.float64)
            bm = np.asarray(self.box_world_to_box, np.float64)
            if host_cache is not None:
                host_cache["sc"], host_cache["bm"] = sc, bm
        o = np.asarray(origin, np.float64)
        sc_rel = (sc - o).astype(np.float32)
        bm_rel = bm.copy()
        if bm_rel.shape[0]:
            # box = M·p_world, p_world = p_rel + origin  ⇒  t' = t + R·origin
            bm_rel[:, :3, 3] += bm_rel[:, :3, :3] @ o
        return dataclasses.replace(
            self, sphere_centers=sc_rel,
            box_world_to_box=bm_rel.astype(np.float32))


def render_opaque(scene: OpaqueScene, camera: Camera, height: int, width: int,
                  reverse_z: bool = True, ray_dir: Optional[Vec3] = None,
                  sky_fn=None):
    """Returns ``(rgb: Vec3, depth: nonlinear buffer, linear_depth)``.

    ``ray_dir`` may be supplied pre-sharded (multi-chip path); ``height`` and
    ``width`` then describe the local slice.

    ``sky_fn(ray_dir: Vec3) -> Vec3``: optional panorama-sky sampler used
    for rays that miss all geometry (replaces ``sky_color`` + starfield).
    The XLA path builds it from ``scene.panorama`` via
    ``sample_equirect_bilinear``; the megakernel injects a pyramid-backed
    sampler (scene.panorama itself never crosses into the kernel).
    """
    if ray_dir is None:
        ray_dir = world_ray_dirs(camera, height, width)
    ray_origin = camera.position

    big = jnp.float32(3.0e38)
    best_t = jnp.full(ray_dir.x.shape, big)
    nx = jnp.zeros((height, width), jnp.float32)
    ny = jnp.zeros_like(nx)
    nz = jnp.zeros_like(nx)
    ar = jnp.zeros_like(nx)
    ag = jnp.zeros_like(nx)
    ab = jnp.zeros_like(nx)
    unshaded = jnp.zeros_like(nx)

    n_spheres = scene.sphere_centers.shape[0]
    for i in range(n_spheres):
        c = scene.sphere_centers[i]
        center = Vec3(c[0], c[1], c[2])
        t0, t1 = ray_sphere(center, scene.sphere_radii[i], ray_origin, ray_dir)
        hit = jnp.logical_and(t0 != t1, t1 > 0.0)
        t = jnp.where(t0 > 0.0, t0, t1)  # front hit, or inside → back wall
        closer = jnp.logical_and(hit, t < best_t)
        p = ray_origin + ray_dir * t
        n = normalize(p - center)
        best_t = jnp.where(closer, t, best_t)
        nx = jnp.where(closer, n.x, nx)
        ny = jnp.where(closer, n.y, ny)
        nz = jnp.where(closer, n.z, nz)
        ar = jnp.where(closer, scene.sphere_albedos[i, 0], ar)
        ag = jnp.where(closer, scene.sphere_albedos[i, 1], ag)
        ab = jnp.where(closer, scene.sphere_albedos[i, 2], ab)
        unshaded = jnp.where(closer, scene.sphere_unshaded[i], unshaded)

    n_boxes = scene.box_world_to_box.shape[0]
    for i in range(n_boxes):
        m = scene.box_world_to_box[i]
        ro_b = transform_point(m, ray_origin)
        rd_b = transform_dir(m, ray_dir)
        hs = scene.box_half_sizes[i]
        half = Vec3(hs[0] * jnp.ones_like(best_t), hs[1] * jnp.ones_like(best_t),
                    hs[2] * jnp.ones_like(best_t))
        t0, t1, hit = ray_box(ro_b, rd_b, half)
        t = jnp.where(t0 > 0.0, t0, t1)
        hit = jnp.logical_and(hit, t > 0.0)
        closer = jnp.logical_and(hit, t < best_t)
        # box normal: dominant axis of the local hit point
        pb = ro_b + rd_b * t
        axx = jnp.abs(pb.x / hs[0])
        ayy = jnp.abs(pb.y / hs[1])
        azz = jnp.abs(pb.z / hs[2])
        n_local = Vec3(
            jnp.where(jnp.logical_and(axx >= ayy, axx >= azz), jnp.sign(pb.x), 0.0),
            jnp.where(jnp.logical_and(ayy > axx, ayy >= azz), jnp.sign(pb.y), 0.0),
            jnp.where(jnp.logical_and(azz > axx, azz > ayy), jnp.sign(pb.z), 0.0),
        )
        # rotate local→world: world_to_box is rigid, so transpose of its
        # rotation (plain scalar indexing — works on packed SMEM views too)
        n = Vec3(m[0, 0] * n_local.x + m[1, 0] * n_local.y + m[2, 0] * n_local.z,
                 m[0, 1] * n_local.x + m[1, 1] * n_local.y + m[2, 1] * n_local.z,
                 m[0, 2] * n_local.x + m[1, 2] * n_local.y + m[2, 2] * n_local.z)
        best_t = jnp.where(closer, t, best_t)
        nx = jnp.where(closer, n.x, nx)
        ny = jnp.where(closer, n.y, ny)
        nz = jnp.where(closer, n.z, nz)
        ar = jnp.where(closer, scene.box_albedos[i, 0], ar)
        ag = jnp.where(closer, scene.box_albedos[i, 1], ag)
        ab = jnp.where(closer, scene.box_albedos[i, 2], ab)
        unshaded = jnp.where(closer, 0.0, unshaded)

    hit_any = best_t < big

    # panorama sky (PanoramaSkyMaterial) or procedural starfield fallback
    if sky_fn is None and getattr(scene, "panorama", None) is not None:
        from ..ops.sampling import sample_equirect_bilinear

        pano = scene.panorama

        def sky_fn(d, _tex=pano):
            return sample_equirect_bilinear(_tex, d)

    # procedural starfield background (space-panorama analog): sparse hashed
    # glints from the quantized ray direction — no texture, no gathers
    star = 0.0
    star_intensity = getattr(scene, "star_intensity", None)
    if sky_fn is None and star_intensity is not None:
        from ..ops.noise import hash3, _hash_to_unit

        k = 220.0
        cx = jnp.floor(ray_dir.x * k).astype(jnp.int32)
        cy = jnp.floor(ray_dir.y * k).astype(jnp.int32)
        cz = jnp.floor(ray_dir.z * k).astype(jnp.int32)
        b = _hash_to_unit(hash3(cx, cy, cz, 77))
        b2 = b * b
        b4 = b2 * b2
        b16 = b4 * b4
        b16 = b16 * b16
        star = jnp.maximum(b16 - 0.7, 0.0) * (1.0 / 0.3) * star_intensity

    # lambert + ambient (StandardMaterial3D-ish), unshaded passthrough
    ld = scene.light_dir
    ndotl = jnp.maximum(-(nx * ld[0] + ny * ld[1] + nz * ld[2]), 0.0)
    shade = scene.ambient + (1.0 - scene.ambient) * ndotl
    shade = jnp.where(unshaded > 0.5, 1.0, shade)
    if sky_fn is not None:
        sky = sky_fn(ray_dir)
        sky_r, sky_g, sky_b = sky.x, sky.y, sky.z
    else:
        sky_r = scene.sky_color[0] + star
        sky_g = scene.sky_color[1] + star
        sky_b = scene.sky_color[2] + star
    rgb = Vec3(
        jnp.where(hit_any, ar * shade, sky_r),
        jnp.where(hit_any, ag * shade, sky_g),
        jnp.where(hit_any, ab * shade, sky_b),
    )

    # depth buffer: view-space z of hits, clear value elsewhere
    hit_pos = ray_origin + ray_dir * jnp.where(hit_any, best_t, 1.0)
    pv = transform_point(camera.world_to_view, hit_pos)
    depth = nonlinear_depth_from_view_z(camera, pv.z, reverse_z=reverse_z)
    depth = jnp.where(hit_any, depth, background_depth(reverse_z))
    linear_depth = jnp.where(hit_any, best_t, 1e7)
    return rgb, depth, linear_depth
