// Native quantize+pack library for the offline weight exporter.
//
// TPU-native counterpart of the reference's CUDA packing kernel
// (engine/src/pack/bit_packing.cu:41-113): the reference packs on-GPU because
// its serving engine consumes bit-planes at runtime; here packing is an
// offline export step, so the right tool is a multithreaded CPU kernel that
// streams a 70B checkpoint through quantize→pack at memory speed.
//
// Format must match flexq_tpu/packing/pack6.py exactly (biased nibble+crumb
// planes, K-tile 128): tests assert bit-for-bit equality with the Python
// reference implementation.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC packlib.cpp -o libflexqpack.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {
constexpr int kTile = 128;     // pack K-tile == quant group size
constexpr int kBias = 32;      // biased-unsigned storage offset
constexpr float kClipMin = 1e-5f;
constexpr float kClipMax = 1e4f;
}  // namespace

extern "C" {

// Pack a signed int6 matrix w[k][n] (int8 container, values in [-32,31]) into
// biased nibble plane hi[k/2][n] and crumb plane lo[k/4][n].
void flexq_pack6(const int8_t* w, int8_t* hi, int8_t* lo, int64_t k, int64_t n) {
  const int64_t tiles = k / kTile;
#pragma omp parallel for schedule(static)
  for (int64_t t = 0; t < tiles; ++t) {
    const int8_t* wt = w + t * kTile * n;
    int8_t* hit = hi + t * (kTile / 2) * n;
    int8_t* lot = lo + t * (kTile / 4) * n;
    for (int64_t r = 0; r < kTile / 2; ++r) {
      const int8_t* row_a = wt + r * n;
      const int8_t* row_b = wt + (r + kTile / 2) * n;
      int8_t* out = hit + r * n;
      for (int64_t c = 0; c < n; ++c) {
        const uint8_t ua = static_cast<uint8_t>(row_a[c] + kBias);
        const uint8_t ub = static_cast<uint8_t>(row_b[c] + kBias);
        out[c] = static_cast<int8_t>((ua >> 2) | ((ub >> 2) << 4));
      }
    }
    for (int64_t r = 0; r < kTile / 4; ++r) {
      const int8_t* r0 = wt + r * n;
      const int8_t* r1 = wt + (r + kTile / 4) * n;
      const int8_t* r2 = wt + (r + kTile / 2) * n;
      const int8_t* r3 = wt + (r + 3 * kTile / 4) * n;
      int8_t* out = lot + r * n;
      for (int64_t c = 0; c < n; ++c) {
        const uint8_t c0 = static_cast<uint8_t>(r0[c] + kBias) & 3;
        const uint8_t c1 = static_cast<uint8_t>(r1[c] + kBias) & 3;
        const uint8_t c2 = static_cast<uint8_t>(r2[c] + kBias) & 3;
        const uint8_t c3 = static_cast<uint8_t>(r3[c] + kBias) & 3;
        out[c] = static_cast<int8_t>(c0 | (c1 << 2) | (c2 << 4) | (c3 << 6));
      }
    }
  }
}

// Per-group(128) symmetric quantization of a dense f32 weight stored [k][n]
// (groups run along k for each column n — the FlexQ weight recipe,
// reference quantizer.py:155-158 with disable_zero_point).
//   q[k][n]    : int8 output in [-2^(bits-1), 2^(bits-1)-1]
//   scale[g][n]: f32 per-group scales, g = k/128 rows
void flexq_group_quant(const float* w, int8_t* q, float* scale, int64_t k,
                       int64_t n, int bits) {
  const int64_t groups = k / kTile;
  const float qmax = static_cast<float>((1 << (bits - 1)) - 1);
  const float qmin = -static_cast<float>(1 << (bits - 1));
#pragma omp parallel for schedule(static)
  for (int64_t g = 0; g < groups; ++g) {
    const float* wg = w + g * kTile * n;
    float* sg = scale + g * n;
    int8_t* qg = q + g * kTile * n;
    for (int64_t c = 0; c < n; ++c) {
      float amax = 0.0f;
      for (int64_t r = 0; r < kTile; ++r) {
        amax = std::max(amax, std::fabs(wg[r * n + c]));
      }
      float s = amax / qmax;
      s = std::min(std::max(s, kClipMin), kClipMax);
      sg[c] = s;
      const float inv = 1.0f / s;
      for (int64_t r = 0; r < kTile; ++r) {
        float v = std::nearbyintf(wg[r * n + c] * inv);
        v = std::min(std::max(v, qmin), qmax);
        qg[r * n + c] = static_cast<int8_t>(v);
      }
    }
  }
}

// Fused quantize + pack: f32 [k][n] -> hi/lo planes + scales in one pass.
void flexq_quant_pack6(const float* w, int8_t* hi, int8_t* lo, float* scale,
                       int8_t* q_scratch, int64_t k, int64_t n) {
  flexq_group_quant(w, q_scratch, scale, k, n, /*bits=*/6);
  flexq_pack6(q_scratch, hi, lo, k, n);
}

// Pack a signed int4 matrix w[k][n] (int8 container, values in [-8,7]) into
// the biased nibble plane p[k/2][n] (format of flexq_tpu/packing/pack4.py:
// byte r of K-tile t holds u=w+8 of rows r | r+64 in low | high nibble).
void flexq_pack4(const int8_t* w, int8_t* p, int64_t k, int64_t n) {
  const int64_t tiles = k / kTile;
#pragma omp parallel for schedule(static)
  for (int64_t t = 0; t < tiles; ++t) {
    const int8_t* wt = w + t * kTile * n;
    int8_t* pt = p + t * (kTile / 2) * n;
    for (int64_t r = 0; r < kTile / 2; ++r) {
      const int8_t* row_a = wt + r * n;
      const int8_t* row_b = wt + (r + kTile / 2) * n;
      int8_t* out = pt + r * n;
      for (int64_t c = 0; c < n; ++c) {
        const uint8_t ua = static_cast<uint8_t>(row_a[c] + 8) & 0xF;
        const uint8_t ub = static_cast<uint8_t>(row_b[c] + 8) & 0xF;
        out[c] = static_cast<int8_t>(ua | (ub << 4));
      }
    }
  }
}

// Fused quantize + pack for the W4 weight-only path.
void flexq_quant_pack4(const float* w, int8_t* p, float* scale,
                       int8_t* q_scratch, int64_t k, int64_t n) {
  flexq_group_quant(w, q_scratch, scale, k, n, /*bits=*/4);
  flexq_pack4(q_scratch, p, k, n);
}

int flexq_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
