// Native host-side point-cloud kernels for the data-loading path.
//
// TPU-native equivalent of the reference's C++ extensions
// (c2p-net/ngenet/cpp_wrappers: grid_subsampling.cpp voxel-hash barycenter
// subsampling, neighbors.cpp nanoflann radius-kNN batch queries;
// dip/torch-nndistance my_lib.cpp CPU brute NN). On TPU the hot path runs
// on-device (ops/pallas + ops/*), but the host data loader still wants fast
// CPU preprocessing when streaming scanned clouds from disk; this library
// provides it with deterministic semantics matching the jitted ops:
//   * grid_subsample: barycenters of occupied voxels, ascending cell-id
//     order (NOT unordered_map order — the C++ reference leaks map ordering
//     into results; here determinism is guaranteed),
//   * radius_knn: fixed-K nearest-within-radius tables (grid-bucketed),
//   * fps: farthest-point sampling,
//   * nn_search: brute-force exact 1-NN (reference my_lib.cpp:3-27).
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <unordered_map>
#include <vector>

namespace {

struct CellAccum {
  double x = 0, y = 0, z = 0;
  int64_t count = 0;
};

inline int64_t cell_id(const float* p, const float* origin, float voxel) {
  // 21 bits per axis: collision-free for grids up to 2^21 cells/axis
  const int64_t gx = std::max<int64_t>(
      0, std::min<int64_t>((1 << 21) - 1,
                           (int64_t)std::floor((p[0] - origin[0]) / voxel)));
  const int64_t gy = std::max<int64_t>(
      0, std::min<int64_t>((1 << 21) - 1,
                           (int64_t)std::floor((p[1] - origin[1]) / voxel)));
  const int64_t gz = std::max<int64_t>(
      0, std::min<int64_t>((1 << 21) - 1,
                           (int64_t)std::floor((p[2] - origin[2]) / voxel)));
  return gx | (gy << 21) | (gz << 42);
}

}  // namespace

extern "C" {

// points (n,3) float32 -> out (capacity,3), out_mask (capacity) uint8.
// Returns number of live rows. Deterministic: cells ordered by ascending id.
int64_t pcr_grid_subsample(const float* points, int64_t n, float voxel,
                           float* out, uint8_t* out_mask,
                           int64_t capacity) {
  float origin[3] = {std::numeric_limits<float>::max(),
                     std::numeric_limits<float>::max(),
                     std::numeric_limits<float>::max()};
  for (int64_t i = 0; i < n; ++i) {
    origin[0] = std::min(origin[0], points[3 * i]);
    origin[1] = std::min(origin[1], points[3 * i + 1]);
    origin[2] = std::min(origin[2], points[3 * i + 2]);
  }
  std::unordered_map<int64_t, CellAccum> cells;
  cells.reserve((size_t)n);
  for (int64_t i = 0; i < n; ++i) {
    auto& c = cells[cell_id(points + 3 * i, origin, voxel)];
    c.x += points[3 * i];
    c.y += points[3 * i + 1];
    c.z += points[3 * i + 2];
    c.count += 1;
  }
  std::vector<std::pair<int64_t, CellAccum>> ordered(cells.begin(),
                                                     cells.end());
  std::sort(ordered.begin(), ordered.end(),
            [](const auto& a, const auto& b) { return a.first < b.first; });
  const int64_t live = std::min<int64_t>((int64_t)ordered.size(), capacity);
  for (int64_t i = 0; i < live; ++i) {
    const auto& c = ordered[(size_t)i].second;
    out[3 * i] = (float)(c.x / c.count);
    out[3 * i + 1] = (float)(c.y / c.count);
    out[3 * i + 2] = (float)(c.z / c.count);
    out_mask[i] = 1;
  }
  for (int64_t i = live; i < capacity; ++i) {
    out[3 * i] = out[3 * i + 1] = out[3 * i + 2] = 0.0f;
    out_mask[i] = 0;
  }
  return live;
}

// queries (nq,3) vs supports (ns,3): K nearest within radius.
// out_idx (nq,K) int32 (0-filled), out_mask (nq,K) uint8.
void pcr_radius_knn(const float* queries, int64_t nq, const float* supports,
                    int64_t ns, float radius, int32_t k, int32_t* out_idx,
                    uint8_t* out_mask) {
  // bucket supports on a grid of cell size = radius
  float origin[3] = {std::numeric_limits<float>::max(),
                     std::numeric_limits<float>::max(),
                     std::numeric_limits<float>::max()};
  for (int64_t i = 0; i < ns; ++i) {
    origin[0] = std::min(origin[0], supports[3 * i]);
    origin[1] = std::min(origin[1], supports[3 * i + 1]);
    origin[2] = std::min(origin[2], supports[3 * i + 2]);
  }
  std::unordered_map<int64_t, std::vector<int32_t>> grid;
  grid.reserve((size_t)ns);
  for (int64_t i = 0; i < ns; ++i) {
    grid[cell_id(supports + 3 * i, origin, radius)].push_back((int32_t)i);
  }
  const float r2 = radius * radius;
  std::vector<std::pair<float, int32_t>> cand;
  for (int64_t q = 0; q < nq; ++q) {
    cand.clear();
    const float* qp = queries + 3 * q;
    const int64_t gx = (int64_t)std::floor((qp[0] - origin[0]) / radius);
    const int64_t gy = (int64_t)std::floor((qp[1] - origin[1]) / radius);
    const int64_t gz = (int64_t)std::floor((qp[2] - origin[2]) / radius);
    for (int64_t dx = -1; dx <= 1; ++dx)
      for (int64_t dy = -1; dy <= 1; ++dy)
        for (int64_t dz = -1; dz <= 1; ++dz) {
          const int64_t cx = gx + dx, cy = gy + dy, cz = gz + dz;
          if (cx < 0 || cy < 0 || cz < 0) continue;
          const int64_t id = cx | (cy << 21) | (cz << 42);
          auto it = grid.find(id);
          if (it == grid.end()) continue;
          for (int32_t s : it->second) {
            const float ddx = qp[0] - supports[3 * s];
            const float ddy = qp[1] - supports[3 * s + 1];
            const float ddz = qp[2] - supports[3 * s + 2];
            const float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
            if (d2 <= r2) cand.emplace_back(d2, s);
          }
        }
    const int32_t found = std::min<int32_t>((int32_t)cand.size(), k);
    std::partial_sort(cand.begin(), cand.begin() + found, cand.end());
    for (int32_t j = 0; j < found; ++j) {
      out_idx[q * k + j] = cand[(size_t)j].second;
      out_mask[q * k + j] = 1;
    }
    for (int32_t j = found; j < k; ++j) {
      out_idx[q * k + j] = found > 0 ? cand[0].second : 0;
      out_mask[q * k + j] = 0;
    }
  }
}

// farthest point sampling: out_idx (n_samples) int32, starts at start_idx.
void pcr_fps(const float* points, int64_t n, int32_t n_samples,
             int32_t start_idx, int32_t* out_idx) {
  std::vector<float> mind((size_t)n, std::numeric_limits<float>::max());
  int32_t last = start_idx;
  out_idx[0] = last;
  for (int32_t s = 1; s < n_samples; ++s) {
    const float* lp = points + 3 * last;
    float best = -1.0f;
    int32_t best_i = 0;
    for (int64_t i = 0; i < n; ++i) {
      const float dx = points[3 * i] - lp[0];
      const float dy = points[3 * i + 1] - lp[1];
      const float dz = points[3 * i + 2] - lp[2];
      const float d2 = dx * dx + dy * dy + dz * dz;
      if (d2 < mind[(size_t)i]) mind[(size_t)i] = d2;
      if (mind[(size_t)i] > best) {
        best = mind[(size_t)i];
        best_i = (int32_t)i;
      }
    }
    out_idx[s] = best_i;
    last = best_i;
  }
}

// exact brute 1-NN: for each of n x-points, nearest of m y-points.
// (reference: dip/torch-nndistance/src/my_lib.cpp:3-27 nnsearch)
void pcr_nn_search(const float* x, int64_t n, const float* y, int64_t m,
                   float* out_d2, int32_t* out_idx) {
  for (int64_t i = 0; i < n; ++i) {
    float best = std::numeric_limits<float>::max();
    int32_t bi = 0;
    const float* xi = x + 3 * i;
    for (int64_t j = 0; j < m; ++j) {
      const float dx = xi[0] - y[3 * j];
      const float dy = xi[1] - y[3 * j + 1];
      const float dz = xi[2] - y[3 * j + 2];
      const float d2 = dx * dx + dy * dy + dz * dz;
      if (d2 < best) {
        best = d2;
        bi = (int32_t)j;
      }
    }
    out_d2[i] = best;
    out_idx[i] = bi;
  }
}

}  // extern "C"
