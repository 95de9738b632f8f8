"""Reproduce the banded-sampler fidelity numbers in PARITY #12 (round 3).

Two measurements over the demo scene at 1080p tile geometry
(block (32,128), texture_knot_group=8, shape knots K=16):

1. ``--fits``: an analytic survey of every (tile × knot-group) batch's
   footprint — which pyramid level the windowed mode alone vs
   windowed+banded selects (pure numpy; fast).  This produced
   "484/1530 shape batches restored to 64³ level-0 (interior pose)".
2. ``--field-err``: for batches where banding engages, the shape-field
   sampling error of windowed-only vs banded against exact base-level
   trilinear, via the real kernel in interpret mode (slow on CPU; a few
   minutes).  This produced "mean 0.0456 → 0.0004, p99 0.136 → 0.014".

Run on any backend (forces CPU interpret mode for the kernel calls).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import numpy as np


def _force_cpu():
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


LANES = 128
H, W = 1080, 1920
BLK = (32, 128)
WINDOW_ROWS = 16
BAND_ROWS = 16
BAND_MAX_SLICES = 32
KNOT_GROUP = 8
SHAPE_KNOTS = 16


def _batch_geometry(pose: str):
    """(t0, t1, ro_model, rd_model, hit, scale, tex) for the demo scene."""
    import jax.numpy as jnp

    from godot_atmosphere_shader_tpu.models.demo import (build_demo_scene,
                                                         demo_camera)
    from godot_atmosphere_shader_tpu.ops.clouds import (CloudSettings,
                                                        clamp_march_distance)
    from godot_atmosphere_shader_tpu.utils.camera import (transform_dir,
                                                          transform_point,
                                                          world_ray_dirs)
    from godot_atmosphere_shader_tpu.utils.vecmath import Vec3, ray_sphere

    cam = demo_camera(pose)
    scene = build_demo_scene(variant="clouds", procedural=False)
    scene.update(0.0, cam)
    _, params_l, _ = scene._sorted_layers(cam)
    p = params_l[0]

    rd = world_ray_dirs(cam, H, W)
    ro = Vec3(*(jnp.full((H, W), float(v)) for v in np.asarray(cam.position)))
    clouds_bottom = float(p.planet_radius
                          + p.cloud_bottom * p.atmosphere_height)
    clouds_top = float(p.planet_radius + p.cloud_top * p.atmosphere_height)
    m2w = np.linalg.inv(np.asarray(p.world_to_model))
    pc = Vec3(*(jnp.full((H, W), float(v)) for v in m2w[:3, 3]))
    top0, top1 = ray_sphere(pc, clouds_top, ro, rd)
    hit = np.asarray(top0 != top1)
    t0 = jnp.maximum(top0, 0.0)
    ro_m = transform_point(p.world_to_model, ro)
    rd_m = transform_dir(p.world_to_model, rd)
    settings = CloudSettings(bottom_height=clouds_bottom,
                             top_height=clouds_top,
                             density_scale=p.cloud_density_scale,
                             ground_height=float(p.planet_radius))
    t1 = clamp_march_distance(ro_m, t0, top1, settings)
    return (np.asarray(t0), np.asarray(t1),
            [np.asarray(v) for v in (ro_m.x, ro_m.y, ro_m.z)],
            [np.asarray(v) for v in (rd_m.x, rd_m.y, rd_m.z)],
            hit, float(np.asarray(p.cloud_shape_scale)),
            np.asarray(p.cloud_shape_texture))


def _level_select(mins, maxs, levels):
    """(windowed_level, banded_level) — None means no fit (floor mode)."""
    win = band = None
    for li, (S, _base) in enumerate(levels):
        ok = True
        span = 0.0
        spans = []
        for ax in range(3):
            i_lo = np.floor(mins[ax] * S - 0.5)
            i_hi = np.floor(maxs[ax] * S - 0.5) + 1.0
            ok = ok and (i_lo >= 0.0) and (i_hi <= S - 1.0)
            span += (i_hi - i_lo) * float(S ** ax)
            spans.append(i_hi - i_lo)
        if (ok and span + (LANES - 1) <= WINDOW_ROWS * LANES - 1
                and win is None):
            win = li
        yx = spans[1] * S + spans[0]
        if (ok and yx + (LANES - 1) <= BAND_ROWS * LANES - 1
                and spans[2] + 1 <= BAND_MAX_SLICES and band is None):
            band = li
    return win, band


def _iter_batches(t0, t1, ro, rd, hit, scale, require_full=False):
    for gy in range(0, H, BLK[0]):
        for gx in range(0, W, BLK[1]):
            sl = (slice(gy, gy + BLK[0]), slice(gx, gx + BLK[1]))
            hs = hit[sl]
            if (not hs.all()) if require_full else (not hs.any()):
                continue
            for g0 in range(0, SHAPE_KNOTS + 1, KNOT_GROUP):
                ks = range(g0, min(g0 + KNOT_GROUP, SHAPE_KNOTS + 1))
                planes = []
                for k in ks:
                    tt = t0[sl] + (t1[sl] - t0[sl]) * (k / SHAPE_KNOTS)
                    planes.append([(ro[a][sl] + rd[a][sl] * tt) * scale
                                   for a in range(3)])
                yield sl, hs, planes


def run_fits(pose: str) -> None:
    from godot_atmosphere_shader_tpu.ops.pallas.texsample import (
        build_tex3d_pyramid)

    t0, t1, ro, rd, hit, scale, tex = _batch_geometry(pose)
    _, meta = build_tex3d_pyramid(tex)
    n = len(meta.levels)
    win_c = np.zeros(n + 1, np.int64)
    eff_c = np.zeros(n + 1, np.int64)
    total = 0
    for sl, hs, planes in _iter_batches(t0, t1, ro, rd, hit, scale):
        mins = np.full(3, np.inf)
        maxs = np.full(3, -np.inf)
        for pl3 in planes:
            for ax in range(3):
                f = pl3[ax] - np.floor(pl3[ax])
                mins[ax] = min(mins[ax], f[hs].min())
                maxs[ax] = max(maxs[ax], f[hs].max())
        win, band = _level_select(mins, maxs, meta.levels)
        total += 1
        win_c[win if win is not None else n] += 1
        eff = win if win is not None else n
        if band is not None and (win is None or band < win):
            eff = band
        eff_c[eff] += 1
    labels = [f"L{i}({S}^3)" for i, (S, _) in enumerate(meta.levels)]
    labels.append("floor")
    print(f"{pose}: {total} batches")
    print("  windowed:", {l: int(c) for l, c in zip(labels, win_c) if c})
    print("  +banded :", {l: int(c) for l, c in zip(labels, eff_c) if c})


def run_field_err(pose: str, max_batches: int) -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from godot_atmosphere_shader_tpu.ops.pallas import texsample as ts
    from godot_atmosphere_shader_tpu.ops.sampling import (
        sample_trilinear_repeat)

    t0, t1, ro, rd, hit, scale, tex = _batch_geometry(pose)
    data, meta = ts.build_tex3d_pyramid(tex)

    def run3d(x, y, z, band_rows):
        def kern(tab_ref, x_ref, y_ref, z_ref, o_ref):
            o_ref[:] = ts.sample_tex3d(tab_ref, meta, x_ref[:], y_ref[:],
                                       z_ref[:], window_rows=WINDOW_ROWS,
                                       band_rows=band_rows)

        return np.asarray(pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
            interpret=True,
        )(data, jnp.asarray(x), jnp.asarray(y), jnp.asarray(z)))

    errs_w, errs_b = [], []
    done = 0
    for sl, hs, planes in _iter_batches(t0, t1, ro, rd, hit, scale,
                                        require_full=True):
        if done >= max_batches:
            break
        x = np.concatenate([p[0] for p in planes], 0).astype(np.float32)
        y = np.concatenate([p[1] for p in planes], 0).astype(np.float32)
        z = np.concatenate([p[2] for p in planes], 0).astype(np.float32)
        off = run3d(x, y, z, 0)
        on = run3d(x, y, z, BAND_ROWS)
        if np.abs(on - off).max() == 0.0:
            continue  # banding did not engage
        exact = np.asarray(sample_trilinear_repeat(jnp.asarray(tex), x, y, z))
        errs_w.append(np.abs(off - exact).ravel())
        errs_b.append(np.abs(on - exact).ravel())
        done += 1
    if not errs_w:
        print(f"{pose}: banding never engaged in the sampled batches")
        return
    ew, eb = np.concatenate(errs_w), np.concatenate(errs_b)
    print(f"{pose}: {done} engaged batches, {ew.size} samples")
    print(f"  windowed-only vs exact: mean {ew.mean():.4f} "
          f"p99 {np.percentile(ew, 99):.4f} max {ew.max():.4f}")
    print(f"  banded        vs exact: mean {eb.mean():.4f} "
          f"p99 {np.percentile(eb, 99):.4f} max {eb.max():.4f}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pose", default="interior")
    ap.add_argument("--fits", action="store_true")
    ap.add_argument("--field-err", action="store_true")
    ap.add_argument("--max-batches", type=int, default=16)
    args = ap.parse_args()
    _force_cpu()
    if not (args.fits or args.field_err):
        args.fits = True
    if args.fits:
        run_fits(args.pose)
    if args.field_err:
        run_field_err(args.pose, args.max_batches)


if __name__ == "__main__":
    main()
