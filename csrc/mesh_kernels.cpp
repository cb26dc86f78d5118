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

// ---------------------------------------------------------------------
// greedy node coloring of the mesh adjacency graph (nodes adjacent iff
// they share an element edge).  Used for exact matrix-free stiffness
// diagonal extraction: same-color nodes are never coupled in K, so one
// probe per (color, component) reads a whole diagonal slice.
//   conn     [ne*3] int32 triangle connectivity
//   colors   [n_nodes] int32 out
//   n_colors receives the color count (<= maxdeg+1)
int hdnn_greedy_color(const int32_t* conn, int64_t ne, int64_t n_nodes,
                      int32_t* colors, int32_t* n_colors) {
  std::vector<uint64_t> keys;
  keys.reserve(static_cast<size_t>(ne) * 3);
  const auto pack = [](int32_t u, int32_t v) {
    const uint64_t lo = static_cast<uint32_t>(std::min(u, v));
    const uint64_t hi = static_cast<uint32_t>(std::max(u, v));
    return (lo << 32) | hi;
  };
  for (int64_t e = 0; e < ne; ++e) {
    const int32_t a = conn[e * 3], b = conn[e * 3 + 1],
                  c = conn[e * 3 + 2];
    keys.push_back(pack(a, b));
    keys.push_back(pack(b, c));
    keys.push_back(pack(c, a));
  }
  std::sort(keys.begin(), keys.end());
  keys.erase(std::unique(keys.begin(), keys.end()), keys.end());

  std::vector<int64_t> off(n_nodes + 1, 0);
  for (const uint64_t k : keys) {
    ++off[(k >> 32) + 1];
    ++off[(k & 0xFFFFFFFFu) + 1];
  }
  for (int64_t i = 0; i < n_nodes; ++i) off[i + 1] += off[i];
  std::vector<int32_t> adj(off[n_nodes]);
  std::vector<int64_t> cur(off.begin(), off.end() - 1);
  for (const uint64_t k : keys) {
    const int32_t u = static_cast<int32_t>(k >> 32);
    const int32_t v = static_cast<int32_t>(k & 0xFFFFFFFFu);
    adj[cur[u]++] = v;
    adj[cur[v]++] = u;
  }

  std::fill(colors, colors + n_nodes, -1);
  std::vector<int64_t> mark;  // mark[c] == i  <=>  color c used by a
  int32_t maxc = 0;           // neighbour of node i
  for (int64_t i = 0; i < n_nodes; ++i) {
    for (int64_t a = off[i]; a < off[i + 1]; ++a) {
      const int32_t cc = colors[adj[a]];
      if (cc >= 0) {
        if (cc >= static_cast<int32_t>(mark.size()))
          mark.resize(cc + 1, -1);
        mark[cc] = i;
      }
    }
    int32_t c = 0;
    while (c < static_cast<int32_t>(mark.size()) && mark[c] == i) ++c;
    colors[i] = c;
    maxc = std::max(maxc, c);
  }
  *n_colors = maxc + 1;
  return 0;
}

// Sequential first-come greedy maximal matching over ordered candidate
// endpoint pairs (a[i], b[i]): accept candidate i iff neither endpoint
// was claimed by a lower-ranked accepted candidate.  Rank order IS the
// quality lever (edge-lexsort order pairs ~100% of structured and ~97%
// of Delaunay triangles — see mesh/banded.py:pair_connectivity);
// sequential execution is O(n) and immune to the rank-monotone conflict
// chains that make the vectorized conflict-resolution formulation
// O(chain length) rounds (~1,400 at 922K structured, measured).
//   a, b     [n_cand] int64 candidate endpoints (element ids < ne)
//   accept   [n_cand] uint8 out
//   matched  [ne] uint8 out (must be zero-initialized by the caller)
int hdnn_greedy_match(const int64_t* a, const int64_t* b, int64_t n_cand,
                      int64_t ne, uint8_t* accept, uint8_t* matched) {
  for (int64_t i = 0; i < n_cand; ++i) {
    const int64_t u = a[i], v = b[i];
    if (u < 0 || v < 0 || u >= ne || v >= ne) return 1;
    if (matched[u] || matched[v]) {
      accept[i] = 0;
    } else {
      matched[u] = matched[v] = 1;
      accept[i] = 1;
    }
  }
  return 0;
}

}  // extern "C"

extern "C" {

// ---------------------------------------------------------------------
// structured triangulation: cells of an nx-by-ny point lattice.
//   variant: 0 = "up" (n00-n11 diagonal), 1 = "down" (n10-n01),
//            2 = "zigzag" (alternating by (i+j) parity)
//   cells: [2*(nx-1)*(ny-1) * 3] int32, same interleaved order as
//   mesh/structured.py rectangle_tri_zigzag (two triangles per quad,
//   quads row-major by (i, j)).
int hdnn_structured_cells(int64_t nx, int64_t ny, int variant,
                          int32_t* cells) {
  int64_t out = 0;
  for (int64_t i = 0; i + 1 < nx; ++i) {
    for (int64_t j = 0; j + 1 < ny; ++j) {
      const int32_t n00 = static_cast<int32_t>(i * ny + j);
      const int32_t n10 = static_cast<int32_t>((i + 1) * ny + j);
      const int32_t n01 = static_cast<int32_t>(i * ny + j + 1);
      const int32_t n11 = static_cast<int32_t>((i + 1) * ny + j + 1);
      const bool up = variant == 0 || (variant == 2 && ((i + j) % 2 == 0));
      if (up) {
        cells[out++] = n00; cells[out++] = n10; cells[out++] = n11;
        cells[out++] = n00; cells[out++] = n11; cells[out++] = n01;
      } else {
        cells[out++] = n00; cells[out++] = n10; cells[out++] = n01;
        cells[out++] = n10; cells[out++] = n11; cells[out++] = n01;
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------
// banded-assembly planning + filling (same contracts / tie-breaks as
// mesh/banded.py build_banded_assembly + _build_recompute_tables).
//
// plan layout (int64[12]):
//   [0] b     [1] eb    [2] wnode
//   [3] bn    [4] nb    [5] wct
//   [6] br    [7] nbr   [8] ew    [9] wn
//   [10] has_recompute (0/1)      [11] reserved
static const int kCandidates[6] = {4, 8, 16, 32, 64, 128};

int hdnn_banded_plan(const int32_t* conn, int64_t ne,
                     const int32_t* inc, int64_t n, int64_t maxdeg,
                     int64_t window_limit, int64_t block_multiple,
                     int64_t* plan) {
  // ---- forward: element blocks -> node windows
  bool found = false;
  for (int ci = 0; ci < 6 && !found; ++ci) {
    const int64_t b = kCandidates[ci];
    if (b % block_multiple) continue;
    const int64_t eb = (ne + b - 1) / b;
    const int32_t padval = conn[(ne - 1) * 3];
    int64_t wsize = 0;
    for (int64_t blk = 0; blk < b; ++blk) {
      int32_t lo = INT32_MAX, hi = INT32_MIN;
      const int64_t e0 = blk * eb, e1 = std::min(ne, (blk + 1) * eb);
      for (int64_t e = e0; e < e1; ++e)
        for (int v = 0; v < 3; ++v) {
          const int32_t x = conn[e * 3 + v];
          lo = std::min(lo, x); hi = std::max(hi, x);
        }
      if (e1 < (blk + 1) * eb) {  // padded slots in this block
        lo = std::min(lo, padval); hi = std::max(hi, padval);
      }
      if (e0 >= e1 && e1 >= ne) { lo = padval; hi = padval; }
      wsize = std::max<int64_t>(wsize, (int64_t)hi - lo + 1);
    }
    if (wsize <= window_limit) {
      plan[0] = b; plan[1] = eb; plan[2] = std::min<int64_t>(wsize, n);
      found = true;
    }
  }
  if (!found) return 1;

  // ---- backward: node blocks -> cotangent windows
  const int64_t nct = ne * 3;
  found = false;
  for (int ci = 0; ci < 6 && !found; ++ci) {
    const int64_t bn = kCandidates[ci];
    if (bn % block_multiple) continue;
    const int64_t nb = (n + bn - 1) / bn;
    int64_t wsize = 0;
    for (int64_t blk = 0; blk < bn; ++blk) {
      int64_t lo = nct, hi = -1;
      const int64_t r0 = blk * nb, r1 = std::min(n, (blk + 1) * nb);
      for (int64_t r = r0; r < r1; ++r)
        for (int64_t k = 0; k < maxdeg; ++k) {
          const int32_t x = inc[r * maxdeg + k];
          if (x >= 0) { lo = std::min<int64_t>(lo, x);
                        hi = std::max<int64_t>(hi, x); }
        }
      if (hi < 0) { lo = 0; hi = 0; }   // empty block
      wsize = std::max<int64_t>(wsize, hi - lo + 1);
    }
    if (wsize <= window_limit) {
      plan[3] = bn; plan[4] = nb; plan[5] = std::min<int64_t>(wsize, nct);
      found = true;
    }
  }
  if (!found) return 1;

  // ---- recompute backward: node blocks -> element windows
  plan[10] = 0;
  for (int ci = 0; ci < 6; ++ci) {
    const int64_t br = kCandidates[ci];
    if (br % block_multiple) continue;
    const int64_t nbr = (n + br - 1) / br;
    int64_t ew = 0;
    std::vector<int64_t> emins(br), emaxs(br);
    for (int64_t blk = 0; blk < br; ++blk) {
      int64_t lo = ne, hi = -1;
      const int64_t r0 = blk * nbr, r1 = std::min(n, (blk + 1) * nbr);
      for (int64_t r = r0; r < r1; ++r)
        for (int64_t k = 0; k < maxdeg; ++k) {
          const int32_t x = inc[r * maxdeg + k];
          if (x >= 0) { lo = std::min<int64_t>(lo, x / 3);
                        hi = std::max<int64_t>(hi, x / 3); }
        }
      if (hi < 0) { lo = 0; hi = 0; }
      emins[blk] = lo; emaxs[blk] = hi;
      ew = std::max<int64_t>(ew, hi - lo + 1);
    }
    if (3 * ew > window_limit) continue;
    ew = std::min(ew, ne);
    int64_t wn = 0;
    for (int64_t blk = 0; blk < br; ++blk) {
      const int64_t s = std::min(emins[blk], ne - ew);
      int32_t lo = INT32_MAX, hi = INT32_MIN;
      for (int64_t e = s; e < s + ew; ++e)
        for (int v = 0; v < 3; ++v) {
          const int32_t x = conn[e * 3 + v];
          lo = std::min(lo, x); hi = std::max(hi, x);
        }
      wn = std::max<int64_t>(wn, (int64_t)hi - lo + 1);
    }
    if (wn > window_limit) continue;
    plan[6] = br; plan[7] = nbr; plan[8] = ew;
    plan[9] = std::min<int64_t>(wn, n);
    plan[10] = 1;
    break;
  }
  return 0;
}

int hdnn_banded_fill(const int32_t* conn, int64_t ne,
                     const int32_t* inc, int64_t n, int64_t maxdeg,
                     const int64_t* plan,
                     int32_t* starts, int32_t* conn_rel,
                     int32_t* ct_starts, int32_t* inc_rel,
                     int32_t* re_nstarts, int32_t* re_estarts,
                     int32_t* re_conn_rel, int32_t* re_inc_rel) {
  const int64_t b = plan[0], eb = plan[1], wnode = plan[2];
  const int64_t bn = plan[3], nb = plan[4], wct = plan[5];
  const int64_t nct = ne * 3;
  const int32_t padval = conn[(ne - 1) * 3];

  // forward tables
  for (int64_t blk = 0; blk < b; ++blk) {
    int32_t lo = INT32_MAX;
    const int64_t e0 = blk * eb, e1 = std::min(ne, (blk + 1) * eb);
    for (int64_t e = e0; e < e1; ++e)
      for (int v = 0; v < 3; ++v) lo = std::min(lo, conn[e * 3 + v]);
    if (e1 < (blk + 1) * eb) lo = std::min(lo, padval);
    if (e0 >= ne) lo = padval;
    const int32_t s =
        std::min<int64_t>(lo, n - wnode) < 0
            ? 0 : (int32_t)std::min<int64_t>(lo, n - wnode);
    starts[blk] = s;
    int64_t out = blk * eb * 3;
    for (int64_t e = e0; e < e1; ++e)
      for (int v = 0; v < 3; ++v)
        conn_rel[out++] = conn[e * 3 + v] - s;
    for (int64_t e = std::max(e0, e1); e < (blk + 1) * eb; ++e)
      for (int v = 0; v < 3; ++v)
        conn_rel[out++] = padval - s;
  }

  // backward (cotangent-window) tables
  for (int64_t blk = 0; blk < bn; ++blk) {
    int64_t lo = nct, hi = -1;
    const int64_t r0 = blk * nb, r1 = std::min(n, (blk + 1) * nb);
    for (int64_t r = r0; r < r1; ++r)
      for (int64_t k = 0; k < maxdeg; ++k) {
        const int32_t x = inc[r * maxdeg + k];
        if (x >= 0) { lo = std::min<int64_t>(lo, x);
                      hi = std::max<int64_t>(hi, x); }
      }
    if (hi < 0) lo = 0;
    const int64_t s = std::min(lo, nct - wct);
    ct_starts[blk] = (int32_t)s;
    int64_t out = blk * nb * maxdeg;
    for (int64_t r = r0; r < r1; ++r)
      for (int64_t k = 0; k < maxdeg; ++k) {
        const int32_t x = inc[r * maxdeg + k];
        inc_rel[out++] = x >= 0 ? (int32_t)(x - s) : (int32_t)wct;
      }
    for (int64_t r = std::max(r0, r1); r < (blk + 1) * nb; ++r)
      for (int64_t k = 0; k < maxdeg; ++k) inc_rel[out++] = (int32_t)wct;
  }

  // recompute-backward tables
  if (plan[10]) {
    const int64_t br = plan[6], nbr = plan[7], ew = plan[8], wn = plan[9];
    for (int64_t blk = 0; blk < br; ++blk) {
      int64_t lo = ne, hi = -1;
      const int64_t r0 = blk * nbr, r1 = std::min(n, (blk + 1) * nbr);
      for (int64_t r = r0; r < r1; ++r)
        for (int64_t k = 0; k < maxdeg; ++k) {
          const int32_t x = inc[r * maxdeg + k];
          if (x >= 0) { lo = std::min<int64_t>(lo, x / 3);
                        hi = std::max<int64_t>(hi, x / 3); }
        }
      if (hi < 0) lo = 0;
      const int64_t es = std::min(lo, ne - ew);
      re_estarts[blk] = (int32_t)es;
      int32_t nlo = INT32_MAX;
      for (int64_t e = es; e < es + ew; ++e)
        for (int v = 0; v < 3; ++v) nlo = std::min(nlo, conn[e * 3 + v]);
      const int64_t ns = std::min<int64_t>(nlo, n - wn);
      re_nstarts[blk] = (int32_t)ns;
      int64_t out = blk * ew * 3;
      for (int64_t e = es; e < es + ew; ++e)
        for (int v = 0; v < 3; ++v)
          re_conn_rel[out++] = (int32_t)(conn[e * 3 + v] - ns);
      out = blk * nbr * maxdeg;
      for (int64_t r = r0; r < r1; ++r)
        for (int64_t k = 0; k < maxdeg; ++k) {
          const int32_t x = inc[r * maxdeg + k];
          re_inc_rel[out++] =
              x >= 0 ? (int32_t)(x - 3 * es) : (int32_t)(3 * ew);
        }
      for (int64_t r = std::max(r0, r1); r < (blk + 1) * nbr; ++r)
        for (int64_t k = 0; k < maxdeg; ++k)
          re_inc_rel[out++] = (int32_t)(3 * ew);
    }
  }
  return 0;
}

}  // extern "C"
