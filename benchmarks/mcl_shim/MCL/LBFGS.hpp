// Minimal mcl::optlib shim: Problem<T,DIM> + LBFGS<T,DIM>, the API surface
// the reference consumes (src/TetEnergyTerm.hpp:90-97, TetEnergyTerm.cpp:133).
// This is an independent small L-BFGS with backtracking line search, only
// used to build the reference library as the CPU baseline oracle.
#ifndef MCL_OPTLIB_LBFGS_SHIM_H
#define MCL_OPTLIB_LBFGS_SHIM_H
#include <Eigen/Dense>
#include <algorithm>
#include <cstdlib>
#include <vector>

namespace mcl {
namespace optlib {

template <typename T, int DIM>
class Problem {
 public:
  typedef Eigen::Matrix<T, DIM, 1> VecT;
  virtual ~Problem() {}
  virtual T value(const VecT& x) = 0;
  virtual T gradient(const VecT& x, VecT& grad) = 0;
  virtual bool converged(const VecT& x0, const VecT& x1, const VecT& grad) {
    return grad.norm() < T(1e-8) || (x0 - x1).norm() < T(1e-8);
  }
};

template <typename T, int DIM>
class LBFGS {
 public:
  typedef Eigen::Matrix<T, DIM, 1> VecT;
  int max_iters = 40;
  int history = 6;

  int minimize(Problem<T, DIM>& problem, VecT& x) {
    // Experiment hook (see MCL_SHIM_TIGHT below): give the tight mode
    // enough iterations to actually reach its 1e-11 gradient target.
    static const bool tight_iters = std::getenv("MCL_SHIM_TIGHT") != nullptr;
    const int iter_cap = tight_iters ? 500 : max_iters;
    std::vector<VecT> s_hist, y_hist;
    VecT g, g_old, x_old;
    problem.gradient(x, g);
    int it = 0;
    for (; it < iter_cap; ++it) {
      // Two-loop recursion.
      VecT q = g;
      const int m = static_cast<int>(s_hist.size());
      std::vector<T> alpha(m), rho(m);
      for (int i = m - 1; i >= 0; --i) {
        rho[i] = T(1) / std::max(y_hist[i].dot(s_hist[i]), T(1e-300));
        alpha[i] = rho[i] * s_hist[i].dot(q);
        q -= alpha[i] * y_hist[i];
      }
      if (m > 0) {
        T gamma = s_hist[m - 1].dot(y_hist[m - 1]) /
                  std::max(y_hist[m - 1].dot(y_hist[m - 1]), T(1e-300));
        q *= gamma;
      }
      for (int i = 0; i < m; ++i) {
        T beta = rho[i] * y_hist[i].dot(q);
        q += (alpha[i] - beta) * s_hist[i];
      }
      VecT dir = -q;

      // Backtracking line search on value().
      T f0 = problem.value(x);
      T t = T(1);
      VecT x_new = x + t * dir;
      int ls = 0;
      while (ls < 30 && problem.value(x_new) > f0 - T(1e-4) * t * g.dot(-dir)) {
        t *= T(0.5);
        x_new = x + t * dir;
        ++ls;
      }
      if (ls >= 30) break;  // no descent

      x_old = x;
      g_old = g;
      x = x_new;
      problem.gradient(x, g);
      // MCL_SHIM_TIGHT: experiment hook (parity-gap study) — ignore the
      // problem's own stopping rule and solve to near machine precision.
      // Default behavior (unset) is exactly the problem's converged().
      static const bool tight = std::getenv("MCL_SHIM_TIGHT") != nullptr;
      if (tight) {
        if (g.norm() < T(1e-11)) break;
      } else if (problem.converged(x_old, x, g)) {
        break;
      }

      if (m >= history) {
        s_hist.erase(s_hist.begin());
        y_hist.erase(y_hist.begin());
      }
      s_hist.push_back(x - x_old);
      y_hist.push_back(g - g_old);
    }
    return it;
  }
};

}  // namespace optlib
}  // namespace mcl
#endif
