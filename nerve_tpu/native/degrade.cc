// NERVE-TPU native data pipeline: multithreaded video-frame degradation.
//
// The reference declares a synthetic-degradation pipeline (compression /
// noise / blur / downscale, nerve_cl/config/default.yaml:179-192) but never
// implements it; its data loading is torch tensors from .pt blobs. Here the
// degradation inner loops run in C++ worker threads (ctypes releases the GIL
// for the whole call), so LR-frame synthesis overlaps TPU compute instead of
// serialising behind the Python interpreter.
//
// Exposed C ABI (see nerve_tpu/native/__init__.py):
//   nerve_degrade_batch(hr, n, h, w, c, lr, scale, sigma, blur_k, seed, nthreads)
//     hr: (n, h, w, c) float32 in [0,1]  →  lr: (n, h/scale, w/scale, c)
//     pipeline per frame: box blur (blur_k odd, 0/1 = off) → box downsample
//     by `scale` → additive Gaussian noise (sigma in [0,1] units) → clamp.
//   nerve_corruption_masks(masks, n, h, w, min_frac, max_frac, seed, nthreads)
//     fills (n, h, w) float32 with random zeroed rectangles (1 = corrupted).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <functional>
#include <random>
#include <thread>
#include <vector>

namespace {

void blur_frame(const float* src, float* dst, int h, int w, int c, int k) {
  // Separable box blur with edge clamping. k odd; temp buffer per call.
  const int r = k / 2;
  std::vector<float> tmp(static_cast<size_t>(h) * w * c);
  // Horizontal pass.
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.f;
        for (int dx = -r; dx <= r; ++dx) {
          int xx = std::min(std::max(x + dx, 0), w - 1);
          acc += src[(static_cast<size_t>(y) * w + xx) * c + ch];
        }
        tmp[(static_cast<size_t>(y) * w + x) * c + ch] = acc / k;
      }
    }
  }
  // Vertical pass.
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.f;
        for (int dy = -r; dy <= r; ++dy) {
          int yy = std::min(std::max(y + dy, 0), h - 1);
          acc += tmp[(static_cast<size_t>(yy) * w + x) * c + ch];
        }
        dst[(static_cast<size_t>(y) * w + x) * c + ch] = acc / k;
      }
    }
  }
}

void degrade_one(const float* hr, float* lr, int h, int w, int c, int scale,
                 float sigma, int blur_k, uint64_t seed) {
  const int lh = h / scale, lw = w / scale;
  std::vector<float> blurred;
  const float* src = hr;
  if (blur_k > 1) {
    blurred.resize(static_cast<size_t>(h) * w * c);
    blur_frame(hr, blurred.data(), h, w, c, blur_k);
    src = blurred.data();
  }
  std::mt19937_64 rng(seed);
  std::normal_distribution<float> noise(0.f, sigma);
  const float inv_area = 1.f / (scale * scale);
  for (int y = 0; y < lh; ++y) {
    for (int x = 0; x < lw; ++x) {
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.f;
        for (int dy = 0; dy < scale; ++dy) {
          const size_t row = (static_cast<size_t>(y) * scale + dy) * w;
          for (int dx = 0; dx < scale; ++dx) {
            acc += src[(row + static_cast<size_t>(x) * scale + dx) * c + ch];
          }
        }
        float v = acc * inv_area;
        if (sigma > 0.f) v += noise(rng);
        v = std::min(std::max(v, 0.f), 1.f);
        lr[(static_cast<size_t>(y) * lw + x) * c + ch] = v;
      }
    }
  }
}

void parallel_for(int n, int nthreads, const std::function<void(int)>& fn) {
  nthreads = std::max(1, std::min(nthreads, n));
  std::atomic<int> next(0);
  std::vector<std::thread> workers;
  workers.reserve(nthreads);
  for (int t = 0; t < nthreads; ++t) {
    workers.emplace_back([&] {
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i);
    });
  }
  for (auto& th : workers) th.join();
}

}  // namespace

extern "C" {

void nerve_degrade_batch(const float* hr, int n, int h, int w, int c,
                         float* lr, int scale, float sigma, int blur_k,
                         uint64_t seed, int nthreads) {
  const size_t hr_stride = static_cast<size_t>(h) * w * c;
  const size_t lr_stride = static_cast<size_t>(h / scale) * (w / scale) * c;
  parallel_for(n, nthreads, [&](int i) {
    degrade_one(hr + i * hr_stride, lr + i * lr_stride, h, w, c, scale, sigma,
                blur_k, seed * 0x9E3779B97F4A7C15ull + i);
  });
}

void nerve_corruption_masks(float* masks, int n, int h, int w, float min_frac,
                            float max_frac, uint64_t seed, int nthreads) {
  const size_t stride = static_cast<size_t>(h) * w;
  parallel_for(n, nthreads, [&](int i) {
    std::mt19937_64 rng(seed * 0xD1B54A32D192ED03ull + i);
    std::uniform_real_distribution<float> frac(min_frac, max_frac);
    float* m = masks + i * stride;
    std::fill(m, m + stride, 0.f);
    int bh = std::max(1, static_cast<int>(frac(rng) * h));
    int bw = std::max(1, static_cast<int>(frac(rng) * w));
    std::uniform_int_distribution<int> ry(0, std::max(0, h - bh));
    std::uniform_int_distribution<int> rx(0, std::max(0, w - bw));
    int y0 = ry(rng), x0 = rx(rng);
    for (int y = y0; y < y0 + bh && y < h; ++y)
      std::fill(m + static_cast<size_t>(y) * w + x0,
                m + static_cast<size_t>(y) * w + std::min(x0 + bw, w), 1.f);
  });
}

}  // extern "C"
