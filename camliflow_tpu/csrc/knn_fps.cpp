// Host-side native kernels: brute-force KNN and furthest-point sampling.
//
// TPU-native compute runs through the Pallas kernels (ops/pallas_*.py); these
// C++ implementations serve the host-side paths — dataset preprocessing,
// CPU-only evaluation, and as an independent oracle for kernel tests —
// mirroring the role of the reference's models/csrc extensions
// (k_nearest_neighbor_kernel.cu, furthest_point_sampling_kernel.cu) with the
// same semantics: ascending-distance KNN, FPS starting at index 0.
//
// Built as a plain shared library (no pybind11 in this environment); Python
// binds via ctypes (camliflow_tpu/csrc/__init__.py).

#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// KNN: for each query, indices of the k nearest points (ascending distance,
// ties by lower index). xyz layouts are row-major [n, dim].
void knn_cpu(const float* points, int64_t n_points, const float* queries,
             int64_t n_queries, int64_t dim, int64_t k, int32_t* out_indices) {
#pragma omp parallel for schedule(static)
  for (int64_t q = 0; q < n_queries; ++q) {
    const float* qp = queries + q * dim;
    // insertion sort into fixed k-slot arrays (reference
    // k_nearest_neighbor_kernel.cu:31-49 uses the same scheme)
    std::vector<float> best_d(k, std::numeric_limits<float>::infinity());
    std::vector<int32_t> best_i(k, 0);
    for (int64_t p = 0; p < n_points; ++p) {
      const float* pp = points + p * dim;
      float d = 0.f;
      for (int64_t c = 0; c < dim; ++c) {
        float diff = qp[c] - pp[c];
        d += diff * diff;
      }
      if (d >= best_d[k - 1]) continue;
      int64_t slot = k - 1;
      while (slot > 0 && best_d[slot - 1] > d) {
        best_d[slot] = best_d[slot - 1];
        best_i[slot] = best_i[slot - 1];
        --slot;
      }
      best_d[slot] = d;
      best_i[slot] = static_cast<int32_t>(p);
    }
    std::memcpy(out_indices + q * k, best_i.data(), k * sizeof(int32_t));
  }
}

// FPS: deterministic furthest point sampling, start at index 0, first-max
// tie-break (reference furthest_point_sampling_kernel.cu:48-78).
void fps_cpu(const float* xyz, int64_t n_points, int64_t n_samples,
             int32_t* out_indices, float* work_dist) {
  for (int64_t i = 0; i < n_points; ++i)
    work_dist[i] = std::numeric_limits<float>::infinity();
  int32_t farthest = 0;
  for (int64_t s = 0; s < n_samples; ++s) {
    out_indices[s] = farthest;
    const float* cur = xyz + farthest * 3;
    float best = -1.f;
    int32_t best_idx = 0;
    for (int64_t p = 0; p < n_points; ++p) {
      const float* pp = xyz + p * 3;
      float dx = pp[0] - cur[0], dy = pp[1] - cur[1], dz = pp[2] - cur[2];
      float d = dx * dx + dy * dy + dz * dz;
      if (d < work_dist[p]) work_dist[p] = d;
      if (work_dist[p] > best) {
        best = work_dist[p];
        best_idx = static_cast<int32_t>(p);
      }
    }
    farthest = best_idx;
  }
}

}  // extern "C"
