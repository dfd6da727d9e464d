// Minimal mcl::graphcolor shim: greedy coloring of the stride-blocked
// sparsity graph of a row-major sparse matrix. Provides the API consumed at
// reference src/NodalMultiColorGS.hpp:57,85.
#ifndef MCL_GRAPHCOLOR_SHIM_H
#define MCL_GRAPHCOLOR_SHIM_H
#include <Eigen/Sparse>
#include <vector>

namespace mcl {
namespace graphcolor {

template <typename T>
void color_matrix(const Eigen::SparseMatrix<T, Eigen::RowMajor>& A,
                  std::vector<std::vector<int>>& colors, int stride) {
  const int n = static_cast<int>(A.rows()) / stride;
  std::vector<int> color_of(n, -1);
  std::vector<int> mark;  // color -> last node that used it
  int max_color = 0;
  for (int v = 0; v < n; ++v) {
    // Mark colors of neighbors (any block-row entry).
    for (int s = 0; s < stride; ++s) {
      for (typename Eigen::SparseMatrix<T, Eigen::RowMajor>::InnerIterator it(
               A, v * stride + s);
           it; ++it) {
        int u = static_cast<int>(it.col()) / stride;
        if (u == v) continue;
        int c = color_of[u];
        if (c >= 0) {
          if (static_cast<int>(mark.size()) <= c) mark.resize(c + 1, -1);
          mark[c] = v;
        }
      }
    }
    int c = 0;
    while (c < static_cast<int>(mark.size()) && mark[c] == v) ++c;
    color_of[v] = c;
    if (c + 1 > max_color) max_color = c + 1;
  }
  colors.assign(max_color, {});
  for (int v = 0; v < n; ++v) colors[color_of[v]].push_back(v);
}

}  // namespace graphcolor
}  // namespace mcl
#endif
