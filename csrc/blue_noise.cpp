// Blue-noise mask generation: incremental void-and-cluster.
//
// Native counterpart of tools/gen_blue_noise.py.  The reference ships a
// pre-made blue_noise.png; we generate our own masks, and at sizes >=512²
// the Python/numpy version takes minutes while this runs in seconds — the
// same role the engine's native code plays for the reference's asset
// pipeline.  Exposed through ctypes (see tools/gen_blue_noise.py).
//
// Algorithm: greedy energy-minimizing placement.  Each rank is placed at the
// current minimum of a toroidally wrapped Gaussian energy field; placing a
// point splats its kernel into the field.  The resulting rank map, normalized
// to [0,1), has a blue (high-frequency-only) spectrum.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// Fills `out` (size*size floats, row-major) with blue-noise ranks in [0, 1).
// Returns 0 on success.
int generate_blue_noise(int size, float sigma, uint64_t seed, float* out) {
    if (size <= 0 || size > 8192 || sigma <= 0.0f || out == nullptr) {
        return 1;
    }
    const int n = size * size;
    const int radius = static_cast<int>(4.0f * sigma);
    const int w = 2 * radius + 1;

    // Gaussian splat kernel.
    std::vector<double> splat(static_cast<size_t>(w) * w);
    for (int dy = -radius; dy <= radius; ++dy) {
        for (int dx = -radius; dx <= radius; ++dx) {
            splat[(dy + radius) * w + (dx + radius)] =
                std::exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma));
        }
    }

    // Energy field with a tiny deterministic tie-break dither (xorshift64*).
    std::vector<double> energy(n);
    uint64_t s = seed ? seed : 0x9E3779B97F4A7C15ull;
    for (int i = 0; i < n; ++i) {
        s ^= s >> 12;
        s ^= s << 25;
        s ^= s >> 27;
        energy[i] = 1e-12 * static_cast<double>((s * 0x2545F4914F6CDD1Dull) >> 40);
    }

    std::vector<uint8_t> placed(n, 0);

    // A coarse block-minimum index accelerates the argmin from O(n) to
    // ~O(n/B + B) per placement.
    const int block = 64;
    const int nbx = (size + block - 1) / block;
    const int nby = nbx;
    std::vector<double> block_min(static_cast<size_t>(nbx) * nby);
    std::vector<int> block_arg(static_cast<size_t>(nbx) * nby);

    auto recompute_block = [&](int by, int bx) {
        double best = std::numeric_limits<double>::infinity();
        int arg = -1;
        const int y1 = std::min((by + 1) * block, size);
        const int x1 = std::min((bx + 1) * block, size);
        for (int y = by * block; y < y1; ++y) {
            const int row = y * size;
            for (int x = bx * block; x < x1; ++x) {
                const int i = row + x;
                if (!placed[i] && energy[i] < best) {
                    best = energy[i];
                    arg = i;
                }
            }
        }
        block_min[by * nbx + bx] = best;
        block_arg[by * nbx + bx] = arg;
    };

    for (int by = 0; by < nby; ++by)
        for (int bx = 0; bx < nbx; ++bx) recompute_block(by, bx);

    for (int rank = 0; rank < n; ++rank) {
        // global argmin over block minima
        double best = std::numeric_limits<double>::infinity();
        int bbest = -1;
        for (int b = 0; b < nbx * nby; ++b) {
            if (block_arg[b] >= 0 && block_min[b] < best) {
                best = block_min[b];
                bbest = b;
            }
        }
        const int idx = block_arg[bbest];
        const int py = idx / size;
        const int px = idx % size;
        placed[idx] = 1;
        out[idx] = (static_cast<float>(rank) + 0.5f) / static_cast<float>(n);

        // splat energy (toroidal) and mark touched blocks dirty
        for (int dy = -radius; dy <= radius; ++dy) {
            int yy = py + dy;
            yy -= size * static_cast<int>(std::floor(
                static_cast<double>(yy) / size));
            const double* srow = &splat[(dy + radius) * w];
            double* erow = &energy[yy * size];
            for (int dx = -radius; dx <= radius; ++dx) {
                int xx = px + dx;
                xx -= size * static_cast<int>(std::floor(
                    static_cast<double>(xx) / size));
                erow[xx] += srow[dx + radius];
            }
        }
        // conservative: recompute all blocks overlapping the splat window
        const int by0 = ((py - radius) % size + size) % size / block;
        const int bx0 = ((px - radius) % size + size) % size / block;
        const int span = (2 * radius) / block + 2;
        for (int byi = 0; byi <= span; ++byi) {
            for (int bxi = 0; bxi <= span; ++bxi) {
                recompute_block((by0 + byi) % nby, (bx0 + bxi) % nbx);
            }
        }
    }
    return 0;
}

}  // extern "C"
