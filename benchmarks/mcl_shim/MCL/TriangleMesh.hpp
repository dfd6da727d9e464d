// Minimal mcl::TriangleMesh shim (consumed surface only).
#ifndef MCL_TRIMESH_SHIM_H
#define MCL_TRIMESH_SHIM_H
#include <memory>
#include <vector>

#include "Vec.hpp"

namespace mcl {

class TriangleMesh {
 public:
  typedef std::shared_ptr<TriangleMesh> Ptr;
  static Ptr create() { return std::make_shared<TriangleMesh>(); }

  std::vector<Vec3f> vertices;
  std::vector<Vec3i> faces;
  std::vector<Vec3f> normals;
  int flags = 0;

  void need_normals() {}

  void weighted_masses(std::vector<float>& out, float density) {
    out.assign(vertices.size(), 0.f);
    for (const Vec3i& f : faces) {
      Vec3f n = (vertices[f[1]] - vertices[f[0]])
                    .cross(vertices[f[2]] - vertices[f[0]]);
      float area = 0.5f * n.norm();
      for (int j = 0; j < 3; ++j) out[f[j]] += density * area / 3.f;
    }
  }
};

}  // namespace mcl
#endif
