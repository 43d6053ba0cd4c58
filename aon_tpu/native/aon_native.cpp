// aon_tpu native host-side helpers.
//
// The reference's host-side hot ops are Python/numba (ray/AABB slab tests,
// datasets/ray_utils.py:15-65) and torch DataLoader gathers.  Here the
// equivalents are plain C++ (multithreaded where it pays) exposed through a
// C ABI consumed via ctypes (aon_tpu/native/__init__.py), with pure-numpy
// fallbacks when the shared library is absent.
//
// Build: make -C aon_tpu/native      (produces libaon_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = std::max<int64_t>(1, std::min<int64_t>(hw, n / 4096));
  if (n_threads <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(fn, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Gather a ray batch from the whole-scene buffers: out[i] = src[idx[i]].
// Shapes: rays_o/viewdirs/rgbs are (n, 3); idx is (batch,); outputs (batch, 3).
void aon_ray_batch_gather(const float* rays_o, const float* viewdirs,
                          const float* rgbs, int64_t n, const int64_t* idx,
                          int64_t batch, float* out_o, float* out_d,
                          float* out_rgb) {
  (void)n;
  parallel_for(batch, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int64_t j = idx[i] * 3;
      std::memcpy(out_o + i * 3, rays_o + j, 3 * sizeof(float));
      std::memcpy(out_d + i * 3, viewdirs + j, 3 * sizeof(float));
      std::memcpy(out_rgb + i * 3, rgbs + j, 3 * sizeof(float));
    }
  });
}

// Vectorized ray/AABB slab test (replaces numba bbox_intersection_batch,
// reference ray_utils.py:15-65).  bounds: (2, 3) min/max corners.
// Matches reference semantics: origin-inside-box counts as a miss.
void aon_aabb_intersect(const float* bounds, const float* rays_o,
                        const float* rays_d, int64_t n, uint8_t* hit,
                        float* tnear, float* tfar) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      float tmin = -INFINITY, tmax = INFINITY;
      for (int a = 0; a < 3; ++a) {
        float d = rays_d[i * 3 + a];
        if (d == 0.0f) d = 1.0e-14f;
        float inv = 1.0f / d;
        float t0 = (bounds[a] - rays_o[i * 3 + a]) * inv;
        float t1 = (bounds[3 + a] - rays_o[i * 3 + a]) * inv;
        if (inv < 0.0f) std::swap(t0, t1);
        tmin = std::max(tmin, t0);
        tmax = std::min(tmax, t1);
      }
      bool ok = tmin <= tmax && tmin >= 0.0f && tmax >= 0.0f;
      hit[i] = ok ? 1 : 0;
      tnear[i] = ok ? tmin : 0.0f;
      tfar[i] = ok ? tmax : 0.0f;
    }
  });
}

// RGBA (uint8 HWC) -> float RGB blended onto white:
//   out = rgb/255 * a/255 + (1 - a/255)          (reference sapien.py:96-99)
void aon_rgba_blend_white(const uint8_t* rgba, int64_t npix, float* out) {
  constexpr float kInv255 = 1.0f / 255.0f;
  parallel_for(npix, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      float a = rgba[i * 4 + 3] * kInv255;
      for (int c = 0; c < 3; ++c) {
        out[i * 3 + c] = rgba[i * 4 + c] * kInv255 * a + (1.0f - a);
      }
    }
  });
}

// World-space ray generation for one camera: directions (n, 3) camera-frame,
// c2w row-major (3, 4).  Writes rays_o (broadcast origin) and UNIT viewdirs
// (the parity contract: both direction outputs of the reference are
// normalized; see aon_tpu/core/rays.py).
void aon_generate_rays(const float* dirs, const float* c2w, int64_t n,
                       float* rays_o, float* viewdirs) {
  const float ox = c2w[3], oy = c2w[7], oz = c2w[11];
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const float dx = dirs[i * 3], dy = dirs[i * 3 + 1], dz = dirs[i * 3 + 2];
      float wx = c2w[0] * dx + c2w[1] * dy + c2w[2] * dz;
      float wy = c2w[4] * dx + c2w[5] * dy + c2w[6] * dz;
      float wz = c2w[8] * dx + c2w[9] * dy + c2w[10] * dz;
      float inv = 1.0f / std::sqrt(wx * wx + wy * wy + wz * wz);
      viewdirs[i * 3] = wx * inv;
      viewdirs[i * 3 + 1] = wy * inv;
      viewdirs[i * 3 + 2] = wz * inv;
      rays_o[i * 3] = ox;
      rays_o[i * 3 + 1] = oy;
      rays_o[i * 3 + 2] = oz;
    }
  });
}

}  // extern "C"
