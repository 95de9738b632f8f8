"""Compare real-Godot captures (tools/capture_reference.gd) with our frames.

Closes ROADMAP #5 when an engine is available: renders each captured pose
through the production renderer at matching resolution/time and reports
per-pixel stats against the engine's PNG.

    python tools/compare_captures.py --captures <dir> [--time T] [--glow]
        [--shape-texture DUMP] [--coverage-cubemap ATLAS.png]

Comparison caveats the numbers must be read with:

* the engine frame is tonemapped by its Environment (glow + tonemap);
  pass ``--glow`` to apply our matching output stage, or capture with the
  env's glow disabled;
* Godot's FastNoiseLite textures differ internally from our bakes
  (ROADMAP #7): for texture-exact comparison pass the ENGINE'S OWN texel
  data via ``--shape-texture`` / ``--coverage-cubemap`` (see below) — the
  renderer then samples the same bits the engine sampled, which closes
  the NoiseTexture3D-exactness gap the day an engine is available;
* blue-noise jitter patterns differ (ours is regenerated, PARITY) — expect
  per-pixel dither-level noise even at perfect parity; compare means and
  structure, not individual dithered pixels.

Exporting the textures from Godot (the documented procedure):

* NoiseTexture3D (cloud shape) — run in the scene's editor/GDScript:

      var tex: NoiseTexture3D = ...  # the scene's shape texture
      var imgs := tex.get_data()     # Array[Image], one per z-slice
      for z in imgs.size():
          imgs[z].save_png("res://shape_dump/slice_%03d.png" % z)

  then pass ``--shape-texture shape_dump/`` (a directory of slice PNGs,
  sorted by name = z order; luminance channel used).  A single ``.npy``
  of shape (D, H, W) float32/uint8 is also accepted.

* NoiseCubemap (cloud coverage) — use the plugin's OWN export button
  ("Bake as importable image", ``tools/plugin.gd:39-88``): it writes the
  3×2 face atlas PNG this flag reads back:

      --coverage-cubemap coverage_atlas.png
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

POSES = ["avatar", "exterior", "interior", "space", "sunrise", "sunward"]


def _as_unit_float(a: np.ndarray) -> np.ndarray:
    a = np.asarray(a)
    if a.dtype == np.uint8:
        return a.astype(np.float32) / 255.0
    if a.dtype == np.uint16:
        return a.astype(np.float32) / 65535.0
    return a.astype(np.float32)


def load_shape_dump(path: str) -> np.ndarray:
    """(D, H, W) float32 in [0, 1] from a .npy dump or a directory of
    z-slice PNGs (sorted by filename)."""
    from godot_atmosphere_shader_tpu.utils.image_io import read_png

    if path.endswith(".npy"):
        return _as_unit_float(np.load(path))
    slices = sorted(f for f in os.listdir(path)
                    if f.lower().endswith(".png"))
    if not slices:
        raise SystemExit(f"--shape-texture: no slice PNGs in {path}")
    vol = []
    for f in slices:
        img = _as_unit_float(read_png(os.path.join(path, f)))
        if img.ndim == 3:
            img = img[..., :3].mean(-1)  # luminance of an L8-as-RGB save
        vol.append(img)
    return np.stack(vol).astype(np.float32)


def load_coverage_atlas(path: str) -> np.ndarray:
    """(6, res, res) float32 faces from the plugin's 3×2 atlas PNG
    (row-major faces 0,1,2 / 3,4,5 — ``noise_cubemap.gd:143-155``)."""
    from godot_atmosphere_shader_tpu.utils.image_io import read_png

    atlas = _as_unit_float(read_png(path))
    if atlas.ndim == 3:
        atlas = atlas[..., :3].mean(-1)
    h, w = atlas.shape
    if w % 3 or h % 2 or w // 3 != h // 2:
        raise SystemExit(f"--coverage-cubemap: {path} is {w}x{h}, "
                         "not a 3x2 square-face atlas")
    res = h // 2
    return np.stack([atlas[y * res:(y + 1) * res, x * res:(x + 1) * res]
                     for i, (y, x) in enumerate(
                         (divmod(i, 3) for i in range(6)))]).astype(
                             np.float32)


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
    ap.add_argument("--shape-texture", default=None,
                    help="Godot NoiseTexture3D dump: .npy (D,H,W) or a "
                         "directory of z-slice PNGs (see module docstring "
                         "for the GDScript export snippet)")
    ap.add_argument("--coverage-cubemap", default=None,
                    help="NoiseCubemap 3x2 atlas PNG (the plugin's own "
                         "'Bake as importable image' output)")
    args = ap.parse_args()

    from godot_atmosphere_shader_tpu.models.demo import (build_demo_scene,
                                                         demo_camera)
    from godot_atmosphere_shader_tpu.utils.color import linear_to_srgb
    from godot_atmosphere_shader_tpu.utils.image_io import read_png

    shape_tex = (load_shape_dump(args.shape_texture)
                 if args.shape_texture else None)
    coverage = (load_coverage_atlas(args.coverage_cubemap)
                if args.coverage_cubemap else None)

    results = {}
    for pose in POSES:
        path = os.path.join(args.captures, f"capture_{pose}.png")
        if not os.path.exists(path):
            continue
        ref = read_png(path).astype(np.float32) / 255.0
        h, w = ref.shape[:2]
        scene = build_demo_scene(variant=args.variant, procedural=False)
        for atmo in scene.atmospheres:
            if shape_tex is not None:
                atmo.set_shader_parameter("u_cloud_shape_texture", shape_tex)
            if coverage is not None:
                atmo.set_shader_parameter("u_cloud_coverage_cubemap",
                                          coverage)
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
