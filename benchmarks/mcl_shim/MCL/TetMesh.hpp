// Minimal mcl::TetMesh shim with the members/methods the reference
// consumes (samples/utils/AddMeshes.hpp:97-177, src/PassiveObject.hpp,
// src/DynamicObject.hpp).
#ifndef MCL_TETMESH_SHIM_H
#define MCL_TETMESH_SHIM_H
#include <algorithm>
#include <array>
#include <map>
#include <memory>
#include <vector>

#include "Vec.hpp"

namespace mcl {

class TetMesh {
 public:
  typedef std::shared_ptr<TetMesh> Ptr;
  static Ptr create() { return std::make_shared<TetMesh>(); }

  std::vector<Vec3f> vertices;
  std::vector<Vec4i> tets;
  std::vector<Vec3i> faces;   // surface faces (filled by need_faces)
  std::vector<Vec3f> normals;
  int flags = 0;

  void need_faces() {
    if (!faces.empty()) return;
    // Boundary faces = faces appearing in exactly one tet; wound outward.
    std::map<std::array<int, 3>, std::pair<Vec3i, int>> count;
    auto add = [&](int a, int b, int c) {
      std::array<int, 3> key = {a, b, c};
      std::sort(key.begin(), key.end());
      auto it = count.find(key);
      if (it == count.end())
        count[key] = {Vec3i(a, b, c), 1};
      else
        it->second.second += 1;
    };
    for (const Vec4i& t : tets) {
      add(t[0], t[2], t[1]);
      add(t[0], t[1], t[3]);
      add(t[0], t[3], t[2]);
      add(t[1], t[2], t[3]);
    }
    for (auto& kv : count)
      if (kv.second.second == 1) faces.push_back(kv.second.first);
  }

  void need_normals() {}

  void surface_inds(std::vector<int>& inds) {
    need_faces();
    std::vector<char> on(vertices.size(), 0);
    for (const Vec3i& f : faces)
      for (int j = 0; j < 3; ++j) on[f[j]] = 1;
    inds.clear();
    for (size_t i = 0; i < on.size(); ++i)
      if (on[i]) inds.push_back(static_cast<int>(i));
  }

  void weighted_masses(std::vector<float>& out, float density) {
    out.assign(vertices.size(), 0.f);
    for (const Vec4i& t : tets) {
      Vec3f e0 = vertices[t[1]] - vertices[t[0]];
      Vec3f e1 = vertices[t[2]] - vertices[t[0]];
      Vec3f e2 = vertices[t[3]] - vertices[t[0]];
      float vol = e0.dot(e1.cross(e2)) / 6.f;
      for (int j = 0; j < 4; ++j) out[t[j]] += density * vol / 4.f;
    }
  }

  Eigen::AlignedBox<float, 3> bounds() {
    Eigen::AlignedBox<float, 3> box;
    for (const Vec3f& v : vertices) box.extend(v);
    return box;
  }

  void apply_xform(const Eigen::Transform<float, 3, Eigen::Affine>& xf) {
    for (Vec3f& v : vertices) v = xf * v;
    faces.clear();
  }
};

}  // namespace mcl
#endif
