// Native host-side geometry helpers for admm_elastic_tpu.
//
// The TPU framework keeps the device compute path in XLA; init-time host
// work with irregular memory access (graph coloring, adjacency) is faster
// in C++ than in Python, matching the reference's native posture
// (mcl::graphcolor::color_matrix consumed at src/NodalMultiColorGS.hpp:57).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 geomcore.cpp -o libgeomcore.so

#include <cstdint>
#include <vector>

extern "C" {

// Greedy graph coloring over CSR adjacency. Returns 0 on success.
int greedy_coloring(const int64_t* adj, const int64_t* starts, int64_t n,
                    int32_t* colors_out) {
  std::vector<int32_t> colors(static_cast<size_t>(n), -1);
  std::vector<int32_t> mark;  // color -> last vertex that used it
  mark.reserve(64);
  for (int64_t v = 0; v < n; ++v) {
    // Mark neighbor colors.
    for (int64_t e = starts[v]; e < starts[v + 1]; ++e) {
      int64_t u = adj[e];
      if (u < 0 || u >= n) return 1;
      int32_t c = colors[static_cast<size_t>(u)];
      if (c >= 0) {
        if (static_cast<size_t>(c) >= mark.size()) mark.resize(c + 1, -1);
        mark[static_cast<size_t>(c)] = static_cast<int32_t>(v);
      }
    }
    // First free color.
    int32_t c = 0;
    while (static_cast<size_t>(c) < mark.size() &&
           mark[static_cast<size_t>(c)] == static_cast<int32_t>(v)) {
      ++c;
    }
    colors[static_cast<size_t>(v)] = c;
  }
  for (int64_t v = 0; v < n; ++v) colors_out[v] = colors[static_cast<size_t>(v)];
  return 0;
}

}  // extern "C"
