// Native data-path kernels: sliding-window patch extraction, overlap-
// averaging reconstruction, and fused u8->f32 normalization.
//
// The reference's loader patchifies per image inside a Python loop
// (utils/DataGenerator.py:89-111 via the patchify package) -- the host-side
// bottleneck SURVEY.md §3.1 flags.  These replace the per-patch Python
// copies with OpenMP-parallel tight loops; data/patch.py binds them via
// ctypes and falls back to numpy when the shared library is unavailable.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC patcher.cpp -o libpatcher.so

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// src: (H, W, C) f32 contiguous; out: (ny*nx, P, P, C) f32
// grid rows at y = iy*step, columns x = ix*step (patchify semantics:
// windows fully inside the image).
void extract_patches_f32(const float* src, int64_t H, int64_t W, int64_t C,
                         int64_t P, int64_t step, float* out) {
    const int64_t ny = (H - P) / step + 1;
    const int64_t nx = (W - P) / step + 1;
    const int64_t patch_elems = P * P * C;
#pragma omp parallel for collapse(2) schedule(static)
    for (int64_t iy = 0; iy < ny; ++iy) {
        for (int64_t ix = 0; ix < nx; ++ix) {
            const int64_t y0 = iy * step;
            const int64_t x0 = ix * step;
            float* dst = out + (iy * nx + ix) * patch_elems;
            for (int64_t r = 0; r < P; ++r) {
                const float* row = src + ((y0 + r) * W + x0) * C;
                std::memcpy(dst + r * P * C, row,
                            sizeof(float) * P * C);
            }
        }
    }
}

// patches: (ny*nx, P, P, C); acc/cnt: (H, W, C) f64 accumulators
void accumulate_patches_f32(const float* patches, int64_t H, int64_t W,
                            int64_t C, int64_t P, int64_t step,
                            double* acc, double* cnt) {
    const int64_t ny = (H - P) / step + 1;
    const int64_t nx = (W - P) / step + 1;
    const int64_t patch_elems = P * P * C;
    // serial over patches (overlapping writes); rows parallel inside
    for (int64_t k = 0; k < ny * nx; ++k) {
        const int64_t y0 = (k / nx) * step;
        const int64_t x0 = (k % nx) * step;
        const float* p = patches + k * patch_elems;
#pragma omp parallel for schedule(static)
        for (int64_t r = 0; r < P; ++r) {
            double* arow = acc + ((y0 + r) * W + x0) * C;
            double* crow = cnt + ((y0 + r) * W + x0) * C;
            const float* prow = p + r * P * C;
            for (int64_t i = 0; i < P * C; ++i) {
                arow[i] += prow[i];
                crow[i] += 1.0;
            }
        }
    }
}

// fused u8 -> f32 divide-by-factor (the loader's normalize step)
void normalize_u8_f32(const uint8_t* src, int64_t n, float inv_factor,
                      float* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        out[i] = static_cast<float>(src[i]) * inv_factor;
    }
}

}  // extern "C"
