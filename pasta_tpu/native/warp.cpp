// Native host preprocessing kernels: batched perspective warp + erosion.
//
// C++ counterpart of the reference's native layer (its CUDA plugins become
// Pallas/XLA on TPU; the host data path gets this threaded C++ library).
// Semantics match cv2 defaults used by the pipeline:
//   warpPerspective — bilinear, BORDER_CONSTANT(0), dst->src inverse mapping,
//       round-to-nearest on uint8 stores.
//   erode (k x k ones) — separable window minimum, +inf border.
//
// Exposed as a plain C ABI for ctypes; threading via std::thread (no GIL).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

inline void warp_one(const uint8_t* src, int sh, int sw, int c,
                     const double* m,  // 3x3 dst->src, row major
                     uint8_t* dst, int dh, int dw) {
  for (int y = 0; y < dh; ++y) {
    for (int x = 0; x < dw; ++x) {
      const double denom = m[6] * x + m[7] * y + m[8];
      uint8_t* out = dst + (static_cast<size_t>(y) * dw + x) * c;
      if (std::fabs(denom) < 1e-12) {
        // Horizon line of the perspective map: BORDER_CONSTANT(0), matching
        // cv2 and the JAX warp (sampling (0,0) here would disagree).
        std::memset(out, 0, c);
        continue;
      }
      const double inv = 1.0 / denom;
      const double sx = (m[0] * x + m[1] * y + m[2]) * inv;
      const double sy = (m[3] * x + m[4] * y + m[5]) * inv;
      const int x0 = static_cast<int>(std::floor(sx));
      const int y0 = static_cast<int>(std::floor(sy));
      if (x0 < -1 || y0 < -1 || x0 >= sw || y0 >= sh) {
        std::memset(out, 0, c);
        continue;
      }
      const double fx = sx - x0;
      const double fy = sy - y0;
      const double w00 = (1 - fx) * (1 - fy);
      const double w01 = fx * (1 - fy);
      const double w10 = (1 - fx) * fy;
      const double w11 = fx * fy;
      for (int ch = 0; ch < c; ++ch) {
        double acc = 0.0;
        const bool in00 = x0 >= 0 && y0 >= 0;
        const bool in01 = x0 + 1 < sw && y0 >= 0;
        const bool in10 = x0 >= 0 && y0 + 1 < sh;
        const bool in11 = x0 + 1 < sw && y0 + 1 < sh;
        if (in00)
          acc += w00 * src[(static_cast<size_t>(y0) * sw + x0) * c + ch];
        if (in01)
          acc += w01 * src[(static_cast<size_t>(y0) * sw + x0 + 1) * c + ch];
        if (in10)
          acc += w10 * src[(static_cast<size_t>(y0 + 1) * sw + x0) * c + ch];
        if (in11)
          acc += w11 * src[(static_cast<size_t>(y0 + 1) * sw + x0 + 1) * c + ch];
        const long r = std::lround(acc);
        out[ch] = static_cast<uint8_t>(std::min(255L, std::max(0L, r)));
      }
    }
  }
}

inline void erode_one(const uint8_t* src, int h, int w, int k, uint8_t* dst,
                      uint8_t* tmp) {
  const int pad_lo = k / 2;
  // horizontal pass
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * w;
    uint8_t* trow = tmp + static_cast<size_t>(y) * w;
    for (int x = 0; x < w; ++x) {
      uint8_t mn = 255;
      const int lo = std::max(0, x - pad_lo);
      const int hi = std::min(w - 1, x - pad_lo + k - 1);
      for (int i = lo; i <= hi; ++i) mn = std::min(mn, row[i]);
      trow[x] = mn;
    }
  }
  // vertical pass
  for (int y = 0; y < h; ++y) {
    const int lo = std::max(0, y - pad_lo);
    const int hi = std::min(h - 1, y - pad_lo + k - 1);
    for (int x = 0; x < w; ++x) {
      uint8_t mn = 255;
      for (int i = lo; i <= hi; ++i)
        mn = std::min(mn, tmp[static_cast<size_t>(i) * w + x]);
      dst[static_cast<size_t>(y) * w + x] = mn;
    }
  }
}

// fn(worker, i): `worker` is a dense per-call worker index in
// [0, min(n, num_threads)) so callers can index per-worker scratch safely
// even if a persistent thread pool is ever introduced.
void parallel_for(int n, int num_threads,
                  const std::function<void(int, int)>& fn) {
  if (n <= 1 || num_threads <= 1) {
    for (int i = 0; i < n; ++i) fn(0, i);
    return;
  }
  std::atomic<int> next(0);
  auto worker = [&](int wid) {
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      fn(wid, i);
    }
  };
  std::vector<std::thread> threads;
  const int t = std::min(n, num_threads);
  threads.reserve(t);
  for (int i = 0; i < t; ++i) threads.emplace_back(worker, i);
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Batched warp: n jobs; src [n, sh, sw, c] u8, matrices [n, 9] f64
// (dst->src), dst [n, dh, dw, c] u8.
void pasta_warp_perspective_batch(const uint8_t* src, int n, int sh, int sw,
                                  int c, const double* matrices, uint8_t* dst,
                                  int dh, int dw, int num_threads) {
  const size_t src_stride = static_cast<size_t>(sh) * sw * c;
  const size_t dst_stride = static_cast<size_t>(dh) * dw * c;
  parallel_for(n, num_threads, [&](int, int i) {
    warp_one(src + i * src_stride, sh, sw, c, matrices + i * 9,
             dst + i * dst_stride, dh, dw);
  });
}

// Batched erosion: src/dst [n, h, w] u8 single channel.
void pasta_erode_batch(const uint8_t* src, int n, int h, int w, int k,
                       uint8_t* dst, int num_threads) {
  const size_t stride = static_cast<size_t>(h) * w;
  std::vector<std::vector<uint8_t>> scratch(
      static_cast<size_t>(std::max(1, std::min(n, num_threads))));
  parallel_for(n, num_threads, [&](int worker, int i) {
    auto& tmp = scratch[static_cast<size_t>(worker) % scratch.size()];
    if (tmp.size() < stride) tmp.resize(stride);
    erode_one(src + i * stride, h, w, k, dst + i * stride, tmp.data());
  });
}

int pasta_native_version() { return 1; }

}  // extern "C"
