// Minimal mcl vector-type shim (Eigen-backed), providing the API surface
// the reference consumes from the not-checked-out mclscene submodule.
#ifndef MCL_VEC_SHIM_H
#define MCL_VEC_SHIM_H
#include <Eigen/Dense>

namespace mcl {

template <typename T, int N>
using Vec = Eigen::Matrix<T, N, 1>;

using Vec2f = Eigen::Vector2f;
using Vec3f = Eigen::Vector3f;
using Vec4f = Eigen::Vector4f;
using Vec2d = Eigen::Vector2d;
using Vec3d = Eigen::Vector3d;
using Vec4d = Eigen::Vector4d;
using Vec2i = Eigen::Vector2i;
using Vec3i = Eigen::Vector3i;
using Vec4i = Eigen::Vector4i;

namespace vec {

// Barycentric coordinates of p in tet (p0,p1,p2,p3).
template <typename T>
inline Eigen::Matrix<T, 4, 1> barycoords(const Eigen::Matrix<T, 3, 1>& p,
                                         const Eigen::Matrix<T, 3, 1>& p0,
                                         const Eigen::Matrix<T, 3, 1>& p1,
                                         const Eigen::Matrix<T, 3, 1>& p2,
                                         const Eigen::Matrix<T, 3, 1>& p3) {
  Eigen::Matrix<T, 3, 3> E;
  E.col(0) = p1 - p0;
  E.col(1) = p2 - p0;
  E.col(2) = p3 - p0;
  Eigen::Matrix<T, 3, 1> b = E.fullPivLu().solve(p - p0);
  return Eigen::Matrix<T, 4, 1>(T(1) - b[0] - b[1] - b[2], b[0], b[1], b[2]);
}

// Barycentric coordinates of p (assumed near the triangle plane) in
// triangle (a,b,c).
template <typename T>
inline Eigen::Matrix<T, 3, 1> barycoords(const Eigen::Matrix<T, 3, 1>& p,
                                         const Eigen::Matrix<T, 3, 1>& a,
                                         const Eigen::Matrix<T, 3, 1>& b,
                                         const Eigen::Matrix<T, 3, 1>& c) {
  Eigen::Matrix<T, 3, 1> v0 = b - a, v1 = c - a, v2 = p - a;
  T d00 = v0.dot(v0), d01 = v0.dot(v1), d11 = v1.dot(v1);
  T d20 = v2.dot(v0), d21 = v2.dot(v1);
  T denom = d00 * d11 - d01 * d01;
  if (std::abs(denom) < T(1e-30)) return Eigen::Matrix<T, 3, 1>(1, 0, 0);
  T v = (d11 * d20 - d01 * d21) / denom;
  T w = (d00 * d21 - d01 * d20) / denom;
  return Eigen::Matrix<T, 3, 1>(T(1) - v - w, v, w);
}

}  // namespace vec
}  // namespace mcl
#endif
