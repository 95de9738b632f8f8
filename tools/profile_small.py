"""Small-frame latency decomposition (VERDICT r2 weak #3 / next #10).

BENCH_r02 config 1 showed 44 Mrays/s interactive at 256² (≈1.5 ms/frame)
vs 56 in-graph (≈1.16 ms/frame).  Root cause (measured r3): the tunnel
to the TPU costs ~24 ms per *device→host fetch* round-trip, and the old
methodology divided one drain fetch over only 32 frames — 0.75 ms/frame
of pure measurement artifact.  Interactive mode additionally pays a
per-dispatch host→device send (~1.5–2.5 ms observed).

This tool separates the terms honestly on the real chip:

* **tunnel round-trip**: a tiny jitted add + fetch, min over 20 reps —
  the fixed cost every drain-fetched timing pays once per sample;
* **interactive per-frame** (per-dispatch send included) at two configs;
* **flight frame-count sweep**: total time at K ∈ {32, 96, 224} frames →
  linear fit gives the *fixed* term (≈ the tunnel drain) and the
  *marginal* device per-frame time — the number that means anything;
* **resolution sweep of the marginal** (flight mode, K 32→160) →
  device fixed-per-frame vs per-pixel split;
* **trivial-kernel scan baseline** at two frame counts → the true
  per-frame launch overhead of `lax.map` over a no-op Pallas call.

Writes one JSON line; run on the real TPU (not meaningful on CPU).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

REPEATS = 3


def _drain(x):
    return np.asarray(x)  # device->host fetch: the only true sync point


def measure_rtt(reps: int = 20) -> float:
    """Tunnel round-trip seconds: tiny jit + fetch, min over reps."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda v: v + 1.0)
    _drain(f(jnp.float32(0.0)))
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        _drain(f(jnp.float32(i)))
        best = min(best, time.perf_counter() - t0)
    return best


def flight_total(scene, cam, h, w, frames, repeats=REPEATS):
    """Best TOTAL seconds for a K-frame flight render incl. one drain."""
    times = [0.016 * (i + 1) for i in range(frames)]
    out = scene.render_flight(cam, times, h, w)
    _drain(out["color"][0, 0, 0])
    best = float("inf")
    for r in range(repeats):
        t0 = time.perf_counter()
        out = scene.render_flight(cam, [t + 0.7 * (r + 1) for t in times],
                                  h, w)
        _drain(out["color"][0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    return best


def time_interactive(scene, cam, h, w, frames=32, repeats=REPEATS):
    scene.update(0.0, cam)
    _drain(scene.render(cam, h, w)["color"][0, 0])
    best = float("inf")
    for r in range(repeats):
        t0 = time.perf_counter()
        for i in range(frames):
            scene.update(0.016 * (r * frames + i + 1), cam)
            out = scene.render(cam, h, w)
        _drain(out["color"][0, 0])
        best = min(best, (time.perf_counter() - t0) / frames)
    return best


def trivial_scan_totals(h, w, frame_counts, repeats=REPEATS):
    """lax.map over a do-nothing pallas kernel on the same tile grid: the
    pure per-frame launch/scan floor, reported as totals per frame count."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, bw = 32, 128

    def kern(s_ref, o_ref):
        o_ref[:] = jnp.full((bh, bw), s_ref[0, 0], jnp.float32)

    @jax.jit
    def run(seed_stack):
        def one(s):
            return pl.pallas_call(
                kern,
                grid=(pl.cdiv(h, bh), pl.cdiv(w, bw)),
                in_specs=[pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                                       memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec((bh, bw), lambda i, j: (i, j)),
                out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
            )(s.reshape(1, 1))

        return jax.lax.map(one, seed_stack)

    totals = {}
    for frames in frame_counts:
        seeds = jnp.arange(frames, dtype=jnp.float32)
        _drain(run(seeds)[0, 0, 0])
        best = float("inf")
        for r in range(repeats):
            t0 = time.perf_counter()
            out = run(seeds + 100.0 * (r + 1))
            _drain(out[0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        totals[frames] = best
    return totals


def _marginal_fixed(totals: dict):
    """Least-squares line through (frames, total_s): slope = device
    per-frame seconds, intercept = fixed cost (≈ drain round-trip)."""
    ks = np.array(list(totals), np.float64)
    ts = np.array([totals[int(k)] for k in ks], np.float64)
    slope, fixed = np.polyfit(ks, ts, 1)
    return float(slope), float(fixed)


def main():
    import jax

    if jax.default_backend() != "tpu":
        print("ERROR: latency decomposition needs the real TPU "
              f"(got backend {jax.default_backend()!r})", file=sys.stderr)
        sys.exit(2)
    from godot_atmosphere_shader_tpu.models.demo import (build_demo_scene,
                                                         demo_camera)
    from godot_atmosphere_shader_tpu.utils.compile_cache import (
        enable_compile_cache)

    enable_compile_cache()
    results = {"tunnel_rtt_ms": round(measure_rtt() * 1e3, 3)}

    frame_counts = (32, 96, 224)
    for label, variant, pose, h, w in [
        ("cfg1_256", "v1_no_clouds", "exterior", 256, 256),
        ("cfg2_512", "no_clouds", "exterior", 512, 512),
    ]:
        scene = build_demo_scene(variant=variant, procedural=True)
        cam = demo_camera(pose, height=h, width=w)
        dt_i = time_interactive(scene, cam, h, w)
        totals = {k: flight_total(scene, cam, h, w, k) for k in frame_counts}
        marg, fixed = _marginal_fixed(totals)
        results[label] = {
            "interactive_ms": round(dt_i * 1e3, 3),
            "interactive_mrays": round(h * w / dt_i / 1e6, 1),
            "flight_totals_ms": {str(k): round(v * 1e3, 2)
                                 for k, v in totals.items()},
            "flight_fixed_ms": round(fixed * 1e3, 3),
            "flight_marginal_ms": round(marg * 1e3, 3),
            "flight_device_mrays": round(h * w / marg / 1e6, 1),
            "dispatch_overhead_ms": round((dt_i - marg) * 1e3, 3),
        }

    # resolution sweep of the device marginal (flight, config-1 variant)
    sweep = {}
    scene = build_demo_scene(variant="v1_no_clouds", procedural=True)
    for s in (128, 256, 512, 1024):
        cam = demo_camera("exterior", height=s, width=s)
        t32 = flight_total(scene, cam, s, s, 32, repeats=2)
        t160 = flight_total(scene, cam, s, s, 160, repeats=2)
        sweep[s] = (t160 - t32) / 128.0
    px = np.array([s * s for s in sweep], np.float64)
    dt = np.array(list(sweep.values()), np.float64)
    slope, fixed = np.polyfit(px, dt, 1)
    results["marginal_sweep_ms"] = {str(s): round(v * 1e3, 4)
                                    for s, v in sweep.items()}
    results["fit"] = {
        "device_fixed_ms_per_frame": round(float(fixed) * 1e3, 4),
        "device_throughput_mrays": round(1.0 / float(slope) / 1e6, 1),
    }
    tt = trivial_scan_totals(256, 256, (32, 224))
    results["trivial_scan_256"] = {
        "marginal_us_per_frame": round(
            (tt[224] - tt[32]) / 192.0 * 1e6, 1),
        "totals_ms": {str(k): round(v * 1e3, 2) for k, v in tt.items()},
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
