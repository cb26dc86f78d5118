// Native host-side mesh preprocessing kernels.
//
// The reference does all preprocessing in Python/numpy; at million-element
// scale the edge-extraction / incidence / banded-table builds become a
// noticeable fraction of startup.  These kernels keep the same contracts
// as the numpy implementations in hidenn_fem_tpu/mesh/* (which remain the
// fallback when this library is not built) and are exposed to Python via
// ctypes (no pybind11 dependency).
//
// Build:  python -m hidenn_fem_tpu.mesh.native --build
//         (g++ -O3 -march=native -shared -fPIC)
//
// All functions return 0 on success.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// unique_edges: all unique undirected element edges.
//   conn      [ne*3] int32 triangle connectivity (row-major)
//   out       [ne*3*2] int32 output buffer (caller-allocated upper bound)
//   out_count receives the number of unique edges written
int hdnn_unique_edges(const int32_t* conn, int64_t ne,
                      int32_t* out, int64_t* out_count) {
  std::vector<uint64_t> keys;
  keys.reserve(static_cast<size_t>(ne) * 3);
  for (int64_t e = 0; e < ne; ++e) {
    const int32_t a = conn[e * 3 + 0];
    const int32_t b = conn[e * 3 + 1];
    const int32_t c = conn[e * 3 + 2];
    const auto pack = [](int32_t u, int32_t v) {
      const uint64_t lo = static_cast<uint32_t>(std::min(u, v));
      const uint64_t hi = static_cast<uint32_t>(std::max(u, v));
      return (lo << 32) | hi;
    };
    keys.push_back(pack(a, b));
    keys.push_back(pack(b, c));
    keys.push_back(pack(c, a));
  }
  std::sort(keys.begin(), keys.end());
  keys.erase(std::unique(keys.begin(), keys.end()), keys.end());
  for (size_t i = 0; i < keys.size(); ++i) {
    out[i * 2 + 0] = static_cast<int32_t>(keys[i] >> 32);
    out[i * 2 + 1] = static_cast<int32_t>(keys[i] & 0xFFFFFFFFu);
  }
  *out_count = static_cast<int64_t>(keys.size());
  return 0;
}

// ---------------------------------------------------------------------
// incidence degree pass: per-node count of references in conn.
int hdnn_node_degrees(const int32_t* conn, int64_t ne, int64_t n_nodes,
                      int32_t* degrees) {
  std::memset(degrees, 0, sizeof(int32_t) * n_nodes);
  for (int64_t i = 0; i < ne * 3; ++i) {
    ++degrees[conn[i]];
  }
  return 0;
}

// incidence fill: table [n_nodes * maxdeg] int32, -1 padded, entry =
// flat row index into conn referencing the node (same contract as
// mesh/types.py build_incidence_table).
int hdnn_incidence(const int32_t* conn, int64_t ne, int64_t n_nodes,
                   int64_t maxdeg, int32_t* table) {
  std::fill(table, table + n_nodes * maxdeg, -1);
  std::vector<int32_t> cursor(static_cast<size_t>(n_nodes), 0);
  for (int64_t i = 0; i < ne * 3; ++i) {
    const int32_t n = conn[i];
    table[static_cast<int64_t>(n) * maxdeg + cursor[n]++] =
        static_cast<int32_t>(i);
  }
  return 0;
}

// ---------------------------------------------------------------------
// hole punching: keep[i] = 1 iff point i is outside every disk.
//   points [n*2] float64, holes [h*3] float64 (cx, cy, r)
int hdnn_outside_holes(const double* points, int64_t n,
                       const double* holes, int64_t n_holes,
                       uint8_t* keep) {
  for (int64_t i = 0; i < n; ++i) {
    const double x = points[i * 2], y = points[i * 2 + 1];
    uint8_t k = 1;
    for (int64_t h = 0; h < n_holes; ++h) {
      const double dx = x - holes[h * 3];
      const double dy = y - holes[h * 3 + 1];
      const double r = holes[h * 3 + 2];
      if (dx * dx + dy * dy <= r * r) {
        k = 0;
        break;
      }
    }
    keep[i] = k;
  }
  return 0;
}

}  // extern "C"
