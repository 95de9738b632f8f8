"""Gas-giant regime accuracy study (VERDICT r3 missing #4 / next #5).

The reference's own guidance anticipates ~64 atmosphere raymarch steps for
gas giants (``atmosphere_funcs_v2.gdshaderinc:42-43``: "Rocky planets
don't need much [8 works], gas giants need more [64 works]") while every
demo config runs 8 steps at rocky geometry (R/H = 12.5, optically thin).
This tool measures, at gas-giant geometry (large R/H, optically thick
full-traversal rays):

1. **Sun-ray optical-depth accuracy** of the analytic Gauss-Legendre path
   (``ops/optical_depth.optical_depth_analytic``, GL-8 default) and of the
   reference's 256x256 LUT pipeline (64-step Riemann bake + bilinear),
   both against an independent float64 composite-Simpson ground truth of
   the same integrand (cubic falloff, clamp semantics, below-surface
   full-density span).  Errors are reported both on raw OD and on
   transmittance exp(-k*OD) (the visually relevant quantity -- at large OD
   the transmittance saturates to 0, forgiving absolute OD error).
2. **View-march step convergence** of ``compute_atmosphere_v2`` on
   optically-thick full-traversal rays: per-step-count RGB/alpha deltas
   against a 512-step reference, validating the reference's 8-rocky /
   64-gas-giant guidance on our integrator.

Writes one JSON dict to stdout (and GAS_GIANT_STUDY.json with --write).
The measured bounds are pinned by ``tests/test_gas_giant.py``.

Run on CPU (the study is measurement, not perf):
    JAX_PLATFORMS=cpu python tools/gas_giant_study.py
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Jupiter-flavored demo-unit geometry: R/H = 40 and 100 (the demo planet is
# R/H = 12.5).  density chosen for genuinely thick limbs: the grazing
# full-traversal chord reaches OD in the tens (transmittance ~ 0).
GEOMETRIES = [
    {"name": "gas_giant", "radius": 1000.0, "height": 25.0, "density": 2.0},
    {"name": "gas_giant_thin_shell", "radius": 6000.0, "height": 60.0,
     "density": 4.0},
]


def _density_f64(r, R, H, dens):
    y = 1.0 - np.clip((r - R) / H, 0.0, 1.0)
    return y * y * y * dens


def od_truth_f64(pos, direction, R, H, dens, n=40001):
    """Independent ground truth: float64 composite Simpson over the shell
    span of the SAME integrand the analytic path models (y^3 * density^2
    above ground, full density^2 below the surface).  Geometric splitting
    at the ground crossings keeps the integrand smooth per span."""
    pos = np.asarray(pos, np.float64)
    d = np.asarray(direction, np.float64)
    d = d / np.linalg.norm(d)
    ra = R + H
    b = float(pos @ d)
    q2 = float(pos @ pos - b * b)

    ha = ra * ra - q2
    if ha <= 0.0:
        return 0.0
    sq = np.sqrt(ha)
    s, e = max(-b - sq, 0.0), max(-b + sq, 0.0)

    hg = R * R - q2
    if hg > 0.0:
        sg = np.sqrt(hg)
        g0 = np.clip(-b - sg, s, e)
        g1 = np.clip(-b + sg, s, e)
    else:
        g0 = g1 = e

    def simpson(a0, a1):
        if a1 <= a0:
            return 0.0
        t = np.linspace(a0, a1, n)
        r = np.sqrt((t + b) ** 2 + q2)
        y = _density_f64(r, R, H, 1.0)
        w = np.ones(n)
        w[1:-1:2], w[2:-1:2] = 4.0, 2.0
        return float((t[1] - t[0]) / 3.0 * (w * y).sum())

    return (simpson(s, g0) + simpson(g1, e) + (g1 - g0)) * dens * dens


def sample_rays(R, H, n, rng):
    """In-shell sample positions x uniform directions, biased toward the
    hard cases: half the positions sit in the bottom 20% of the shell and
    a third of the directions are near-grazing (the tangent-chord peak)."""
    hfrac = np.where(rng.random(n) < 0.5, rng.random(n) * 0.2, rng.random(n))
    radius = R + H * hfrac
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pos = u * radius[:, None]
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    graze = np.cross(u, rng.normal(size=(n, 3)))
    graze /= np.linalg.norm(graze, axis=1, keepdims=True)
    mask = rng.random(n) < 0.33
    d[mask] = (graze[mask] + 0.02 * rng.normal(size=(mask.sum(), 3)))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return pos.astype(np.float32), d.astype(np.float32)


def study_od(geo, n=512, seed=0):
    import jax.numpy as jnp

    from godot_atmosphere_shader_tpu.ops.optical_depth import (
        LUT_RESOLUTION, bake_optical_depth, get_baked_optical_depth,
        optical_depth_analytic, optical_depth_reference)
    from godot_atmosphere_shader_tpu.utils.vecmath import Vec3, vec3

    R, H, dens = geo["radius"], geo["height"], geo["density"]
    rng = np.random.default_rng(seed)
    pos, d = sample_rays(R, H, n, rng)

    truth = np.array([od_truth_f64(pos[i], d[i], R, H, dens)
                      for i in range(n)])

    pv = Vec3(jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
              jnp.asarray(pos[:, 2]))
    dv = Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]),
              jnp.asarray(d[:, 2]))
    center = vec3(0.0, 0.0, 0.0)

    candidates = {
        "analytic_gl8": np.asarray(optical_depth_analytic(
            pv, dv, center, R, H, dens, quad_points=8)),
        "analytic_gl16": np.asarray(optical_depth_analytic(
            pv, dv, center, R, H, dens, quad_points=16)),
        "riemann64": np.asarray(optical_depth_reference(
            pv, dv, center, R, H, dens, steps=64)),
        "lut256_bilinear": np.asarray(get_baked_optical_depth(
            pv, dv, center,
            bake_optical_depth(R, H, dens, resolution=LUT_RESOLUTION),
            R, H)),
    }

    # transmittance at the demo's blue scattering coefficient (the most
    # extinction-sensitive channel): k = pow4(400/440) * strength(=1)
    k = (400.0 / 440.0) ** 4
    t_true = np.exp(-k * truth)
    scale = float(np.max(truth))
    out = {"od_max": scale, "od_mean": float(np.mean(truth)), "n_rays": n}
    for name, got in candidates.items():
        rel = np.abs(got - truth) / np.maximum(truth, 1e-3 * scale)
        terr = np.abs(np.exp(-k * got.astype(np.float64)) - t_true)
        out[name] = {
            "od_rel_max": float(np.max(rel)),
            "od_rel_p99": float(np.quantile(rel, 0.99)),
            "transmittance_abs_max": float(np.max(terr)),
            "transmittance_abs_p99": float(np.quantile(terr, 0.99)),
        }
    return out


def study_march(geo, n=256, seed=1):
    """Step-count convergence of compute_atmosphere_v2 on full-traversal
    exterior rays (camera outside the shell, rays through the limb)."""
    import jax.numpy as jnp

    from godot_atmosphere_shader_tpu.models.params import AtmosphereParams
    from godot_atmosphere_shader_tpu.ops.atmosphere_v2 import (
        compute_atmosphere_v2)
    from godot_atmosphere_shader_tpu.utils.vecmath import Vec3, ray_sphere, vec3

    R, H, dens = geo["radius"], geo["height"], geo["density"]
    ra = R + H
    rng = np.random.default_rng(seed)

    # exterior camera; aim points sweep the limb band (impact parameter
    # 0..R+H) so rays cover radial-through-ground to grazing-full-traversal
    eye = np.array([0.0, 0.0, 3.0 * R], np.float32)
    impact = rng.random(n) * ra
    ang = rng.random(n) * 2 * np.pi
    aim = np.stack([impact * np.cos(ang), impact * np.sin(ang),
                    np.zeros(n)], -1)
    d = aim - eye
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)

    origin = Vec3(*(jnp.full(n, v) for v in eye))
    dirs = Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]),
                jnp.asarray(d[:, 2]))
    center = vec3(0.0, 0.0, 0.0)
    t0, t1 = ray_sphere(center, ra, origin, dirs)
    hit = t0 != t1
    tg0, _ = ray_sphere(center, R, origin, dirs)
    t_end = jnp.where(tg0 != t1, jnp.minimum(tg0, t1), t1)  # ground clamps
    t_begin = jnp.maximum(t0, 0.0)

    params = AtmosphereParams.create(
        planet_radius=R, atmosphere_height=H, density=dens,
        scattering_strength=1.0, atmosphere_ambient_color=(0, 0, 0),
        colors_are_srgb=False)
    sun = Vec3(jnp.zeros(n), jnp.zeros(n), jnp.ones(n))

    def render(steps):
        rgb, alpha = compute_atmosphere_v2(
            origin, dirs, center, t_begin, t_end, sun,
            jnp.zeros(n), params, steps)
        cols = np.stack([np.asarray(rgb.x), np.asarray(rgb.y),
                         np.asarray(rgb.z), np.asarray(alpha)], -1)
        return np.where(np.asarray(hit)[:, None], cols, 0.0)

    ref = render(512)
    out = {"n_rays": n, "reference_steps": 512}
    for steps in (8, 16, 32, 64, 128):
        delta = np.abs(render(steps) - ref)
        out[f"steps_{steps}"] = {
            "max_delta": float(np.max(delta)),
            "mean_delta": float(np.mean(delta)),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="also write GAS_GIANT_STUDY.json at the repo root")
    ap.add_argument("--n", type=int, default=512)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    report = {}
    for geo in GEOMETRIES:
        report[geo["name"]] = {
            "geometry": geo,
            "r_over_h": geo["radius"] / geo["height"],
            "optical_depth": study_od(geo, n=args.n),
            "march_convergence": study_march(geo),
        }
    text = json.dumps(report, indent=1)
    print(text)
    if args.write:
        path = os.path.join(os.path.dirname(__file__), "..",
                            "GAS_GIANT_STUDY.json")
        with open(path, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
