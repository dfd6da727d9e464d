"""Dynamic (self) collision: vertex vs deforming tet mesh.

TPU-native equivalent of TetMeshCollision (src/DynamicObject.hpp:33-119):
the reference rebuilds an AABB tree over the current tets every detect and
does point-in-tet + rest-pose nearest-triangle per query vertex. Here both
phases are dense batched tests (every query against every tet/face with
masks) — regular compute that XLA maps straight onto the vector units; a
Morton-grid broad phase can be layered on for very large meshes.

Pipeline per query vertex (identical semantics to the reference):
  1. point-in-tet test against the *current* pose, skipping tets that
     contain the query vertex itself (skip_vert_idx),
  2. map the hit point to the *rest* pose via barycentric coordinates,
  3. find the nearest *rest-pose* surface triangle (again skipping faces
     containing the query vertex),
  4. report the face (global indices), projection barycentrics, rest-pose
     face normal, and dx = -|proj - rest_x|.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TetMeshCollider:
    """Self-collision object for one tet mesh placed in the global DOF array."""

    tets: jax.Array  # i32 [T, 4] GLOBAL vertex indices
    rest_verts: jax.Array  # [V, 3] local rest positions
    faces: jax.Array  # i32 [F, 3] LOCAL surface face indices (rest winding)
    vert_offset: int  # static: global index of local vertex 0

    @property
    def n_tets(self) -> int:
        return self.tets.shape[0]


jax.tree_util.register_dataclass(
    TetMeshCollider, data_fields=("tets", "rest_verts", "faces"), meta_fields=("vert_offset",)
)


def make_tet_mesh_collider(rest_verts: np.ndarray, tets: np.ndarray, faces: np.ndarray,
                           vert_offset: int, dtype=np.float64) -> TetMeshCollider:
    return TetMeshCollider(
        tets=jnp.asarray(np.asarray(tets, dtype=np.int64) + vert_offset, dtype=jnp.int32),
        rest_verts=jnp.asarray(rest_verts, dtype=dtype),
        faces=jnp.asarray(faces, dtype=jnp.int32),
        vert_offset=vert_offset,
    )


def _closest_point_triangle(p, a, b, c):
    """Batched closest point on triangle (Ericson). Shapes broadcast.

    Returns (closest [..,3], bary [..,3])."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = jnp.where(jnp.abs(va + vb + vc) < 1e-30, 1.0, va + vb + vc)
    v = vb / denom
    w = vc / denom
    # Vertex regions.
    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    # Edge regions.
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    t_ab = d1 / jnp.where(jnp.abs(d1 - d3) < 1e-30, 1.0, d1 - d3)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    t_ac = d2 / jnp.where(jnp.abs(d2 - d6) < 1e-30, 1.0, d2 - d6)
    on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)
    t_bc = (d4 - d3) / jnp.where(jnp.abs((d4 - d3) + (d5 - d6)) < 1e-30, 1.0, (d4 - d3) + (d5 - d6))

    v = jnp.where(on_bc, 1.0 - t_bc, v)
    w = jnp.where(on_bc, t_bc, w)
    v = jnp.where(on_ac, 0.0, v)
    w = jnp.where(on_ac, jnp.clip(t_ac, 0, 1), w)
    v = jnp.where(on_ab, jnp.clip(t_ab, 0, 1), v)
    w = jnp.where(on_ab, 0.0, w)
    v = jnp.where(in_c, 0.0, v)
    w = jnp.where(in_c, 1.0, w)
    v = jnp.where(in_b, 1.0, v)
    w = jnp.where(in_b, 0.0, w)
    v = jnp.where(in_a, 0.0, v)
    w = jnp.where(in_a, 0.0, w)
    v = jnp.clip(v, 0.0, 1.0)
    w = jnp.clip(w, 0.0, jnp.maximum(1.0 - v, 0.0))
    closest = a + v[..., None] * ab + w[..., None] * ac
    bary = jnp.stack([1.0 - v - w, v, w], axis=-1)
    return closest, bary


def detect_dynamic(collider: TetMeshCollider, x, query_pts, query_vidx):
    """Detect self-collisions of query vertices against one tet mesh.

    Args:
      x: [N, 3] all current positions.
      query_pts: [H, 3] positions of the query (surface) vertices.
      query_vidx: i32 [H] their global indices.
    Returns dict(mask, face [H,3] global, barys [H,3], normal [H,3], dx [H]).
    """
    from admm_elastic_tpu.ops.svd3 import det3, inv3

    tets = collider.tets  # [T,4] global
    x4 = x[tets]  # [T,4,3]
    e = jnp.stack([x4[:, 1] - x4[:, 0], x4[:, 2] - x4[:, 0], x4[:, 3] - x4[:, 0]], axis=-1)
    det = det3(e)
    safe = jnp.abs(det) > 1e-30
    e_safe = jnp.where(safe[:, None, None], e, jnp.eye(3, dtype=e.dtype))
    einv = inv3(e_safe)  # [T,3,3] (pure arithmetic; no LAPACK custom call)
    base = x4[:, 0]

    d = query_pts[:, None, :] - base[None, :, :]  # [H,T,3]
    b = jnp.einsum("tij,htj->hti", einv, d)  # [H,T,3]
    b0 = 1.0 - jnp.sum(b, axis=-1)
    bary4 = jnp.concatenate([b0[..., None], b], axis=-1)  # [H,T,4]
    inside = jnp.all(bary4 >= 0.0, axis=-1) & safe[None, :]

    # Skip tets containing the query vertex itself (skip_vert_idx,
    # src/DynamicObject.hpp:77).
    own = jnp.any(tets[None, :, :] == query_vidx[:, None, None], axis=-1)
    inside = inside & ~own

    hit_any = jnp.any(inside, axis=-1)  # [H]
    hit_tet = jnp.argmax(inside, axis=-1)  # [H]
    hit_bary = jnp.take_along_axis(bary4, hit_tet[:, None, None], axis=1)[:, 0]  # [H,4]

    # Map to rest pose (src/DynamicObject.hpp:85-99).
    local_tets = tets[hit_tet] - collider.vert_offset  # [H,4] local
    rest4 = collider.rest_verts[local_tets]  # [H,4,3]
    rest_x = jnp.sum(hit_bary[..., None] * rest4, axis=-2)  # [H,3]

    # Nearest rest-pose surface triangle, skipping faces containing the
    # query vertex (local index).
    faces = collider.faces  # [F,3] local
    fa = collider.rest_verts[faces[:, 0]]
    fb = collider.rest_verts[faces[:, 1]]
    fc = collider.rest_verts[faces[:, 2]]
    closest, bary = _closest_point_triangle(
        rest_x[:, None, :], fa[None], fb[None], fc[None]
    )  # [H,F,3]
    dist = jnp.linalg.norm(closest - rest_x[:, None, :], axis=-1)  # [H,F]
    local_q = query_vidx - collider.vert_offset
    face_has_q = jnp.any(faces[None, :, :] == local_q[:, None, None], axis=-1)
    big = jnp.finfo(dist.dtype).max
    dist = jnp.where(face_has_q, big, dist)
    near_f = jnp.argmin(dist, axis=-1)  # [H]
    near_d = jnp.take_along_axis(dist, near_f[:, None], axis=1)[:, 0]
    near_bary = jnp.take_along_axis(bary, near_f[:, None, None], axis=1)[:, 0]  # [H,3]

    hit_faces = faces[near_f]  # [H,3] local
    n = jnp.cross(
        collider.rest_verts[hit_faces[:, 1]] - collider.rest_verts[hit_faces[:, 0]],
        collider.rest_verts[hit_faces[:, 2]] - collider.rest_verts[hit_faces[:, 0]],
    )
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30)

    return dict(
        mask=hit_any,
        face=hit_faces + collider.vert_offset,
        barys=near_bary,
        normal=n,
        dx=jnp.where(hit_any, -near_d, big),
    )
