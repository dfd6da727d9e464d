// Minimal mcl::bvh shim: the traversal API the reference consumes
// (AABBTree init/traverse + PointInTet / NearestTriangle / RayMultiHit
// functors, src/DynamicObject.hpp:33-34,76-100 and
// src/PassiveObject.hpp:70-91). Implemented as a brute-force scan — exact
// same results as a tree, O(n) per query; only used to build the reference
// as the correctness/baseline oracle.
#ifndef MCL_BVH_SHIM_H
#define MCL_BVH_SHIM_H
#include <algorithm>
#include <cmath>
#include <limits>
#include <vector>

#include "Vec.hpp"

namespace mcl {
namespace bvh {

template <typename T>
struct PointInTet {
  Vec<T, 3> point;
  const T* verts;
  const int* tets;
  int hit_tet = -1;
  std::vector<int> skip_vert_idx;

  PointInTet(const Vec<T, 3>& p, const T* v, const int* t)
      : point(p), verts(v), tets(t) {}

  bool visit(int prim) {
    const int* tet = tets + prim * 4;
    for (int j = 0; j < 4; ++j)
      for (int s : skip_vert_idx)
        if (tet[j] == s) return false;
    Vec<T, 3> p[4];
    for (int j = 0; j < 4; ++j)
      p[j] = Vec<T, 3>(verts[tet[j] * 3], verts[tet[j] * 3 + 1],
                       verts[tet[j] * 3 + 2]);
    Vec<T, 4> b = vec::barycoords<T>(point, p[0], p[1], p[2], p[3]);
    if (b[0] >= T(0) && b[1] >= T(0) && b[2] >= T(0) && b[3] >= T(0)) {
      hit_tet = prim;
      return true;
    }
    return false;
  }
};

namespace detail {
template <typename T>
inline Vec<T, 3> closest_point_triangle(const Vec<T, 3>& p, const Vec<T, 3>& a,
                                        const Vec<T, 3>& b,
                                        const Vec<T, 3>& c) {
  // Ericson, Real-Time Collision Detection.
  Vec<T, 3> ab = b - a, ac = c - a, ap = p - a;
  T d1 = ab.dot(ap), d2 = ac.dot(ap);
  if (d1 <= 0 && d2 <= 0) return a;
  Vec<T, 3> bp = p - b;
  T d3 = ab.dot(bp), d4 = ac.dot(bp);
  if (d3 >= 0 && d4 <= d3) return b;
  T vc = d1 * d4 - d3 * d2;
  if (vc <= 0 && d1 >= 0 && d3 <= 0) return a + ab * (d1 / (d1 - d3));
  Vec<T, 3> cp = p - c;
  T d5 = ab.dot(cp), d6 = ac.dot(cp);
  if (d6 >= 0 && d5 <= d6) return c;
  T vb = d5 * d2 - d1 * d6;
  if (vb <= 0 && d2 >= 0 && d6 <= 0) return a + ac * (d2 / (d2 - d6));
  T va = d3 * d6 - d5 * d4;
  if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
    T w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    return b + (c - b) * w;
  }
  T denom = T(1) / (va + vb + vc);
  return a + ab * (vb * denom) + ac * (vc * denom);
}
}  // namespace detail

template <typename T>
struct NearestTriangle {
  Vec<T, 3> point;
  const T* verts;
  const int* faces;
  int hit_tri = -1;
  Vec<T, 3> proj;
  T best = std::numeric_limits<T>::max();
  std::vector<int> skip_vert_idx;

  NearestTriangle(const Vec<T, 3>& p, const T* v, const int* f)
      : point(p), verts(v), faces(f), proj(0, 0, 0) {}

  bool visit(int prim) {
    const int* tri = faces + prim * 3;
    for (int j = 0; j < 3; ++j)
      for (int s : skip_vert_idx)
        if (tri[j] == s) return false;
    Vec<T, 3> a(verts[tri[0] * 3], verts[tri[0] * 3 + 1], verts[tri[0] * 3 + 2]);
    Vec<T, 3> b(verts[tri[1] * 3], verts[tri[1] * 3 + 1], verts[tri[1] * 3 + 2]);
    Vec<T, 3> c(verts[tri[2] * 3], verts[tri[2] * 3 + 1], verts[tri[2] * 3 + 2]);
    Vec<T, 3> q = detail::closest_point_triangle<T>(point, a, b, c);
    T d = (q - point).squaredNorm();
    if (d < best) {
      best = d;
      proj = q;
      hit_tri = prim;
    }
    return false;  // keep scanning for the nearest
  }
};

template <typename T>
struct RayMultiHit {
  Vec<T, 3> origin;
  const T* verts;
  const int* faces;
  int hit_count = 0;

  RayMultiHit(const Vec<T, 3>& o, const T* v, const int* f)
      : origin(o), verts(v), faces(f) {}

  bool visit(int prim) {
    // +x ray-triangle (Moller-Trumbore).
    const int* tri = faces + prim * 3;
    Vec<T, 3> a(verts[tri[0] * 3], verts[tri[0] * 3 + 1], verts[tri[0] * 3 + 2]);
    Vec<T, 3> b(verts[tri[1] * 3], verts[tri[1] * 3 + 1], verts[tri[1] * 3 + 2]);
    Vec<T, 3> c(verts[tri[2] * 3], verts[tri[2] * 3 + 1], verts[tri[2] * 3 + 2]);
    Vec<T, 3> dir(1, 0, 0);
    Vec<T, 3> e1 = b - a, e2 = c - a;
    Vec<T, 3> pv = dir.cross(e2);
    T det = e1.dot(pv);
    if (std::abs(det) < T(1e-12)) return false;
    T inv = T(1) / det;
    Vec<T, 3> tv = origin - a;
    T u = tv.dot(pv) * inv;
    if (u < 0 || u > 1) return false;
    Vec<T, 3> qv = tv.cross(e1);
    T v = dir.dot(qv) * inv;
    if (v < 0 || u + v > 1) return false;
    T t = e2.dot(qv) * inv;
    if (t > T(1e-12)) ++hit_count;
    return false;
  }
};

// Brute-force "tree": exact traversal semantics, no acceleration. The
// traverse protocol is internal to this shim (the reference only
// constructs functors and reads their results).
template <typename T, int N>
class AABBTree {
  const int* prims_ = nullptr;
  const void* verts_ = nullptr;
  int n_ = 0;

 public:
  template <typename S>
  void init(const int* prim_inds, const S* verts, size_t n) {
    prims_ = prim_inds;
    verts_ = verts;
    n_ = static_cast<int>(n);
  }

  template <typename F>
  bool traverse(F& f) const {
    bool hit = false;
    for (int i = 0; i < n_; ++i) {
      if (f.visit(i)) hit = true;
    }
    return hit;
  }
};

}  // namespace bvh
}  // namespace mcl
#endif
