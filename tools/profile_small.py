"""Small-frame latency decomposition (VERDICT r2 weak #3 / next #10).

BENCH_r02 config 1 showed 44 Mrays/s interactive at 256² (≈1.5 ms/frame)
vs 56 in-graph (≈1.16 ms/frame): even with zero host dispatch the device
spends ~1 ms/frame on a frame that is ~0.3 ms of shading at flagship rates.
This tool separates the contributions on the real chip:

* interactive per-frame (per-dispatch tunnel cost included),
* in-graph flight per-frame (zero host dispatch),
* a resolution sweep of the flight mode → fixed-vs-per-pixel split by a
  linear fit over pixel count,
* a trivial-kernel scan baseline → the lax.map / per-frame launch floor
  with no shading at all.

Writes one JSON line; run on the real TPU (not meaningful on CPU).
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

FRAMES = 32
REPEATS = 3


def _drain(x):
    return np.asarray(x)  # device->host fetch: the only true sync point


def time_flight(scene, cam, h, w, frames=FRAMES, repeats=REPEATS):
    times = [0.016 * (i + 1) for i in range(frames)]
    out = scene.render_flight(cam, times, h, w)
    _drain(out["color"][0, 0, 0])
    best = float("inf")
    for r in range(repeats):
        t0 = time.perf_counter()
        out = scene.render_flight(cam, [t + 0.7 * (r + 1) for t in times],
                                  h, w)
        _drain(out["color"][0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / frames)
    return best


def time_interactive(scene, cam, h, w, frames=FRAMES, repeats=REPEATS):
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


def time_trivial_scan(h, w, frames=FRAMES, repeats=REPEATS):
    """lax.map over a do-nothing pallas kernel on the same tile grid: the
    pure per-frame launch/scan floor."""
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

    seeds = jnp.arange(frames, dtype=jnp.float32)
    _drain(run(seeds)[0, 0, 0])
    best = float("inf")
    for r in range(repeats):
        t0 = time.perf_counter()
        out = run(seeds + 100.0 * (r + 1))
        _drain(out[0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / frames)
    return best


def main():
    import jax

    if jax.default_backend() != "tpu":
        print("ERROR: latency decomposition needs the real TPU "
              f"(got backend {jax.default_backend()!r})", file=sys.stderr)
        sys.exit(2)
    from godot_atmosphere_shader_tpu.models.demo import (build_demo_scene,
                                                         demo_camera)

    results = {}
    for label, variant, pose, h, w in [
        ("cfg1_256", "v1_no_clouds", "exterior", 256, 256),
        ("cfg2_512", "no_clouds", "exterior", 512, 512),
    ]:
        scene = build_demo_scene(variant=variant, procedural=True)
        cam = demo_camera(pose, height=h, width=w)
        dt_i = time_interactive(scene, cam, h, w)
        dt_f = time_flight(scene, cam, h, w)
        results[label] = {
            "interactive_ms": round(dt_i * 1e3, 3),
            "flight_ms": round(dt_f * 1e3, 3),
            "dispatch_overhead_ms": round((dt_i - dt_f) * 1e3, 3),
            "interactive_mrays": round(h * w / dt_i / 1e6, 1),
            "flight_mrays": round(h * w / dt_f / 1e6, 1),
        }

    # resolution sweep (flight mode, config-1 variant): fixed + slope fit
    sweep = {}
    scene = build_demo_scene(variant="v1_no_clouds", procedural=True)
    for s in (128, 256, 512, 1024):
        cam = demo_camera("exterior", height=s, width=s)
        sweep[s] = time_flight(scene, cam, s, s, frames=16, repeats=2)
    px = np.array([s * s for s in sweep])
    dt = np.array(list(sweep.values()))
    slope, fixed = np.polyfit(px, dt, 1)
    results["sweep"] = {str(s): round(v * 1e3, 3) for s, v in sweep.items()}
    results["fit"] = {
        "fixed_ms_per_frame": round(float(fixed) * 1e3, 3),
        "throughput_mrays": round(1.0 / float(slope) / 1e6, 1),
    }
    results["trivial_scan_256_ms"] = round(
        time_trivial_scan(256, 256) * 1e3, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
