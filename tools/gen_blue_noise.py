"""Generate a 256×256 blue-noise jitter texture.

The reference ships ``blue_noise.png`` (256×256, 8-bit), fetched per pixel at
``planet_atmosphere_main.gdshaderinc:168-169`` to jitter raymarch starts and
dither alpha.  We generate our own asset from scratch with an incremental
void-and-cluster-style greedy placement: each rank is placed at the current
energy minimum of a toroidal Gaussian splat field, which yields a
high-frequency-only (blue) spectrum.

Run:  python tools/gen_blue_noise.py   (writes godot_atmosphere_shader_tpu/assets/blue_noise_256.npy)
"""

import os
import sys

import numpy as np


def generate_blue_noise(size: int = 256, sigma: float = 1.9, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = size * size

    # Precompute a toroidal Gaussian splat window (radius ~4 sigma).
    radius = int(4 * sigma)
    w = 2 * radius + 1
    ax = np.arange(-radius, radius + 1)
    gx, gy = np.meshgrid(ax, ax, indexing="ij")
    splat = np.exp(-(gx * gx + gy * gy) / (2.0 * sigma * sigma))

    energy = np.zeros((size, size), np.float64)
    # tiny random tie-break so argmin doesn't scan in raster order
    energy += rng.random((size, size)) * 1e-9
    rank = np.full((size, size), -1, np.int64)

    ys = (np.arange(w) - radius) % size
    for k in range(n):
        flat = np.argmin(np.where(rank.reshape(-1) >= 0, np.inf, energy.reshape(-1)))
        py, px = divmod(int(flat), size)
        rank[py, px] = k
        yy = (py + ax) % size
        xx = (px + ax) % size
        energy[np.ix_(yy, xx)] += splat

    return ((rank.astype(np.float64) + 0.5) / n).astype(np.float32)


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--sigma", type=float, default=1.9)
    parser.add_argument("--seed", type=int, default=7)
    args = parser.parse_args()

    out_dir = os.path.join(os.path.dirname(__file__), "..",
                           "godot_atmosphere_shader_tpu", "assets")
    out = os.path.abspath(os.path.join(out_dir, f"blue_noise_{args.size}.npy"))

    # prefer the native generator (csrc/blue_noise.cpp, builds on demand)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from godot_atmosphere_shader_tpu.utils.native import generate_blue_noise_native

    noise = generate_blue_noise_native(args.size, args.sigma, args.seed)
    if noise is None:
        print("native generator unavailable; using the Python fallback")
        noise = generate_blue_noise(args.size, args.sigma, args.seed)
    np.save(out, noise)
    # quick spectrum sanity check: blue noise has a low-frequency deficit
    f = np.abs(np.fft.fft2(noise - noise.mean()))
    low = f[:8, :8].mean()
    high = f[96:160, 96:160].mean()
    print(f"wrote {out}; spectrum low/high = {low / high:.4f} (want << 1)")


if __name__ == "__main__":
    sys.exit(main())
