"""Compare real-Godot captures (tools/capture_reference.gd) with our frames.

Closes ROADMAP #5 when an engine is available: renders each captured pose
through the production renderer at matching resolution/time and reports
per-pixel stats against the engine's PNG.

    python tools/compare_captures.py --captures <dir> [--time T] [--glow]

Comparison caveats the numbers must be read with:

* the engine frame is tonemapped by its Environment (glow + tonemap);
  pass ``--glow`` to apply our matching output stage, or capture with the
  env's glow disabled;
* Godot's FastNoiseLite textures differ internally from our bakes
  (ROADMAP #7): for texture-exact comparison export the scene's
  NoiseTexture3D/NoiseCubemap and point the scene importer at them;
* blue-noise jitter patterns differ (ours is regenerated, PARITY) — expect
  per-pixel dither-level noise even at perfect parity; compare means and
  structure, not individual dithered pixels.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

POSES = ["avatar", "exterior", "interior", "space", "sunrise", "sunward"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--captures", required=True,
                    help="directory with capture_<pose>.png files")
    ap.add_argument("--time", type=float, default=0.0,
                    help="scene time matching the capture (TIME-animated "
                         "detail noise + coverage rotation)")
    ap.add_argument("--variant", default="clouds")
    ap.add_argument("--glow", action="store_true",
                    help="apply our Environment glow/tonemap output stage")
    args = ap.parse_args()

    from godot_atmosphere_shader_tpu.models.demo import (build_demo_scene,
                                                         demo_camera)
    from godot_atmosphere_shader_tpu.utils.color import linear_to_srgb
    from godot_atmosphere_shader_tpu.utils.image_io import read_png

    results = {}
    for pose in POSES:
        path = os.path.join(args.captures, f"capture_{pose}.png")
        if not os.path.exists(path):
            continue
        ref = read_png(path).astype(np.float32) / 255.0
        h, w = ref.shape[:2]
        scene = build_demo_scene(variant=args.variant, procedural=False)
        cam = demo_camera(pose, height=h, width=w)
        scene.update(args.time, cam)
        out = scene.render(cam, h, w)
        img = np.asarray(out["color"])
        if args.glow:
            img = np.asarray(scene.apply_environment(img))
        img = np.asarray(linear_to_srgb(np.clip(img, 0.0, 1.0)))
        d = np.abs(img - ref[..., :3])
        results[pose] = {
            "mean_abs": round(float(d.mean()), 5),
            "p99_abs": round(float(np.percentile(d, 99)), 5),
            "max_abs": round(float(d.max()), 5),
            "mean_ours": round(float(img.mean()), 5),
            "mean_ref": round(float(ref[..., :3].mean()), 5),
        }
    if not results:
        print(f"no capture_<pose>.png files found in {args.captures}",
              file=sys.stderr)
        sys.exit(2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
