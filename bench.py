"""Benchmark harness: demo scene, scattering + high-quality clouds, 1080p.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N, ...}

Baseline: >120 Mrays/s at 1920×1080 (BASELINE.md) — the reference demo scene
at 60 fps equivalent.  Also reports the optical-depth LUT bake latency (the
reference's bake takes 2 frames of SubViewport round-trip; ours is one fused
kernel).
"""

import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

HEIGHT, WIDTH = 1080, 1920
BASELINE_MRAYS = 120.0
FRAMES = 64


def _time_frames(render_fn, scene, cam) -> float:
    """Steady-state frame throughput.

    Each frame gets fresh per-frame state (coverage rotation, time — as an
    interactive loop would), and the queue is drained by *fetching* a pixel
    of the last frame: on tunneled TPU setups ``block_until_ready`` returns
    on enqueue-ack, so only a device→host fetch proves completion.  The one
    drain round-trip amortizes over FRAMES.
    """
    scene.update(0.0, cam)
    out = render_fn()
    _ = np.asarray(out["color"][0, 0])  # warmup + compile + drain
    t0 = time.perf_counter()
    for i in range(FRAMES):
        scene.update(0.016 * (i + 1), cam)
        out = render_fn()
    _ = np.asarray(out["color"][0, 0])
    return (time.perf_counter() - t0) / FRAMES


def bench_all_configs() -> None:
    """Secondary mode (``python bench.py --all``): per-config lines for the
    five BASELINE.json benchmark configs."""
    from godot_atmosphere_shader_tpu.models.demo import build_demo_scene, demo_camera
    from godot_atmosphere_shader_tpu.models.scene import PlanetAtmosphere

    configs = [
        ("1 v1 no-clouds 256x256 exterior", "v1_no_clouds", "exterior", 256, 256, False),
        ("2 v2 scattering no-clouds 512x512", "no_clouds", "exterior", 512, 512, False),
        ("3 scattering+clouds 1080p", "clouds", "avatar", 1080, 1920, False),
        ("4 clouds_high interior 1080p", "clouds_high", "interior", 1080, 1920, False),
        ("5 clouds_high_rm multi-planet 1080p", "clouds_high_rm", "space", 1080, 1920, True),
    ]
    for label, variant, pose, h, w, multi in configs:
        scene = build_demo_scene(variant=variant, procedural=True)
        if multi:
            scene.atmospheres.append(PlanetAtmosphere(
                planet_radius=10.0, atmosphere_height=2.0,
                sun=scene.atmospheres[0].sun, custom_shader="no_clouds",
                position=(-188.991, 0.0, 192.584)))
        cam = demo_camera(pose)
        scene.update(0.0, cam)
        out = scene.render(cam, h, w)
        _ = np.asarray(out["color"][0, 0])
        t0 = time.perf_counter()
        n = 16
        for i in range(n):
            scene.update(0.016 * (i + 1), cam)
            out = scene.render(cam, h, w)
        _ = np.asarray(out["color"][0, 0])
        dt = (time.perf_counter() - t0) / n
        print(json.dumps({"config": label, "frame_ms": round(dt * 1e3, 2),
                          "mrays_per_s": round(h * w / dt / 1e6, 2)}))


def main() -> None:
    from godot_atmosphere_shader_tpu.models.demo import build_demo_scene, demo_camera
    from godot_atmosphere_shader_tpu.ops.optical_depth import bake_optical_depth
    from godot_atmosphere_shader_tpu.ops.pallas.megakernel import render_frame_pallas

    scene = build_demo_scene(variant="clouds_high", procedural=True)
    cam = demo_camera("avatar")
    scene.update(0.0, cam)

    dt_xla = _time_frames(lambda: scene.render(cam, HEIGHT, WIDTH,
                                               renderer="xla"), scene, cam)

    atmo = scene.atmospheres[0]
    try:
        dt_pallas = _time_frames(
            lambda: render_frame_pallas(atmo.build_params(), atmo.config, cam,
                                        scene.opaque, HEIGHT, WIDTH,
                                        block=(32, 128)),
            scene, cam)
    except Exception:
        dt_pallas = float("inf")

    dt = min(dt_xla, dt_pallas)
    path = "xla" if dt_xla <= dt_pallas else "pallas"
    mrays = HEIGHT * WIDTH / dt / 1e6

    # LUT bake latency (256², 64 steps) — drain-fetched, varying density so
    # each call really bakes
    bake = jax.jit(lambda r, h, d: bake_optical_depth(r, h, d))
    _ = np.asarray(bake(100.0, 8.0, 0.5)[0, 0])
    tb = time.perf_counter()
    n_bakes = 10
    for i in range(n_bakes):
        lut = bake(100.0, 8.0, 0.5 + 0.001 * i)
    _ = np.asarray(lut[0, 0])
    bake_ms = (time.perf_counter() - tb) / n_bakes * 1e3

    print(json.dumps({
        "metric": "demo scene scattering+clouds_high raymarch at 1080p",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
        "frame_ms": round(dt * 1e3, 2),
        "path": path,
        "xla_ms": round(dt_xla * 1e3, 2),
        "pallas_ms": (None if dt_pallas == float("inf")
                      else round(dt_pallas * 1e3, 2)),
        "lut_bake_ms": round(bake_ms, 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    if "--all" in sys.argv:
        bench_all_configs()
    else:
        main()
