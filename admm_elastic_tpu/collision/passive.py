"""Passive collision obstacles as batched signed-distance evaluations.

Mirrors the reference obstacle set: analytic Floor and Sphere SDFs
(src/PassiveObject.hpp:32-64) and a mesh obstacle. The reference's
PassiveMesh does BVH point-in-tet + nearest-triangle per query
(src/PassiveObject.hpp:67-107); the TPU-native equivalent is a
precomputed voxel SDF with trilinear interpolation + analytic gradient
(one gather + lerp per query — no trees, no branching).

All `signed_distance` methods are batched: x [..., 3] -> (dx [...],
point [..., 3], normal [..., 3]) with the reference payload convention:
dx < 0 means penetration, `point` is the surface projection target and
`normal` the outward contact normal.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Floor:
    """y-plane floor (src/PassiveObject.hpp:32-45)."""

    y: jax.Array  # scalar

    def signed_distance(self, x):
        dx = x[..., 1] - self.y
        point = jnp.stack([x[..., 0], jnp.broadcast_to(self.y, x[..., 1].shape), x[..., 2]], axis=-1)
        # NOTE: constant broadcast, NOT zeros().at[..., 1].set(1.0) — this
        # environment's XLA:TPU build miscompiles that scatter-set to all
        # zeros when fused into a larger program (silent wrong answer: the
        # floor constraint rows vanish and bodies tunnel through).
        normal = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], x.dtype), x.shape)
        return dx, point, normal


jax.tree_util.register_dataclass(Floor, data_fields=("y",), meta_fields=())


@dataclasses.dataclass(frozen=True)
class Sphere:
    """Analytic sphere obstacle (src/PassiveObject.hpp:48-64)."""

    center: jax.Array  # [3]
    rad: jax.Array  # scalar

    def signed_distance(self, x):
        dir_ = x - self.center
        dist = jnp.linalg.norm(dir_, axis=-1)
        dx = dist - self.rad
        n = dir_ / jnp.maximum(dist, 1e-30)[..., None]
        point = self.center + n * self.rad
        return dx, point, n


jax.tree_util.register_dataclass(Sphere, data_fields=("center", "rad"), meta_fields=())


@dataclasses.dataclass(frozen=True)
class PassiveMeshSDF:
    """Voxel-grid SDF obstacle (TPU-native replacement for PassiveMesh).

    grid [Gx, Gy, Gz] signed distances sampled on a regular lattice with
    origin `origin` and spacing `h`. Queries use trilinear interpolation;
    normals are central differences of the interpolant; the projection
    point is x - dx * normal.
    """

    grid: jax.Array  # [Gx, Gy, Gz]
    origin: jax.Array  # [3]
    h: jax.Array  # scalar spacing

    def _sample(self, x):
        g = self.grid
        shape = jnp.asarray(g.shape, dtype=x.dtype)
        u = (x - self.origin) / self.h
        u = jnp.clip(u, 0.0, shape - 1.000001)
        i0 = jnp.floor(u).astype(jnp.int32)
        f = u - i0.astype(x.dtype)
        ix, iy, iz = i0[..., 0], i0[..., 1], i0[..., 2]

        def at(dx_, dy_, dz_):
            return g[ix + dx_, iy + dy_, iz + dz_]

        c00 = at(0, 0, 0) * (1 - f[..., 2]) + at(0, 0, 1) * f[..., 2]
        c01 = at(0, 1, 0) * (1 - f[..., 2]) + at(0, 1, 1) * f[..., 2]
        c10 = at(1, 0, 0) * (1 - f[..., 2]) + at(1, 0, 1) * f[..., 2]
        c11 = at(1, 1, 0) * (1 - f[..., 2]) + at(1, 1, 1) * f[..., 2]
        c0 = c00 * (1 - f[..., 1]) + c01 * f[..., 1]
        c1 = c10 * (1 - f[..., 1]) + c11 * f[..., 1]
        return c0 * (1 - f[..., 0]) + c1 * f[..., 0]

    def signed_distance(self, x):
        dx = self._sample(x)
        eps = 0.5 * self.h
        grads = []
        for axis in range(3):
            # Constant basis vector (NOT zeros().at[axis].set: this XLA:TPU
            # build can miscompile that scatter-set in fused programs).
            e = eps * jnp.eye(3, dtype=x.dtype)[axis]
            grads.append((self._sample(x + e) - self._sample(x - e)) / (2.0 * eps))
        n = jnp.stack(grads, axis=-1)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
        point = x - dx[..., None] * n
        return dx, point, n

    @staticmethod
    def from_tet_mesh(verts: np.ndarray, tets: np.ndarray, resolution: int = 48, pad: float = 0.1):
        """Build a voxel SDF from a closed tet mesh (host-side, numpy).

        Inside test = point-in-any-tet; magnitude = distance to the surface
        triangle soup. O(G^3 * T) brute force — init-time only.
        """
        from admm_elastic_tpu.geometry.mesh import surface_faces_from_tets

        verts = np.asarray(verts, dtype=np.float64)
        tets = np.asarray(tets, dtype=np.int64)
        lo = verts.min(axis=0) - pad
        hi = verts.max(axis=0) + pad
        h = float((hi - lo).max()) / (resolution - 1)
        dims = np.maximum(((hi - lo) / h).astype(int) + 2, 2)
        axes = [lo[i] + np.arange(dims[i]) * h for i in range(3)]
        pts = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)

        inside = _points_in_tets_np(pts, verts, tets)
        faces = surface_faces_from_tets(tets)
        dist = _point_tri_distance_np(pts, verts, faces)
        sdf = np.where(inside, -dist, dist).reshape(tuple(dims))
        return PassiveMeshSDF(
            grid=jnp.asarray(sdf), origin=jnp.asarray(lo), h=jnp.asarray(h)
        )


jax.tree_util.register_dataclass(
    PassiveMeshSDF, data_fields=("grid", "origin", "h"), meta_fields=()
)


def detect_passive(obstacles, xs):
    """Deepest passive hit per query point across all obstacles.

    Mirrors Collider::detect's payload-min semantics
    (src/Collider.hpp:178-189): each obstacle only overwrites the payload
    if its dx is smaller. Returns (dx, point, normal, hit_mask).
    """
    if not obstacles:
        z3 = jnp.zeros(xs.shape, xs.dtype)
        big = jnp.full(xs.shape[:-1], jnp.finfo(xs.dtype).max, xs.dtype)
        return big, z3, z3, jnp.zeros(xs.shape[:-1], dtype=bool)
    dxs, points, normals = [], [], []
    for obs in obstacles:
        d, p, n = obs.signed_distance(xs)
        dxs.append(d)
        points.append(p)
        normals.append(n)
    dx = jnp.stack(dxs, axis=0)  # [O, ...]
    best = jnp.argmin(dx, axis=0)
    pick = lambda arr: jnp.take_along_axis(
        jnp.stack(arr, axis=0), best[None, ..., None], axis=0
    )[0]
    d_best = jnp.take_along_axis(dx, best[None, ...], axis=0)[0]
    return d_best, pick(points), pick(normals), d_best < 0.0


# numpy helpers for SDF baking -------------------------------------------------

def _points_in_tets_np(pts, verts, tets, chunk=65536):
    x4 = verts[tets]  # [T,4,3]
    e = np.stack([x4[:, 1] - x4[:, 0], x4[:, 2] - x4[:, 0], x4[:, 3] - x4[:, 0]], axis=-1)
    einv = np.linalg.inv(e)  # [T,3,3]
    base = x4[:, 0]  # [T,3]
    inside = np.zeros((len(pts),), dtype=bool)
    for s in range(0, len(pts), chunk):
        p = pts[s : s + chunk]
        # barycentric-ish coords b = einv @ (p - base): [P,T,3]
        d = p[:, None, :] - base[None, :, :]
        b = np.einsum("tij,ptj->pti", einv, d)
        ok = (b >= -1e-12).all(-1) & (b.sum(-1) <= 1 + 1e-12)
        inside[s : s + chunk] = ok.any(-1)
    return inside


def _point_tri_distance_np(pts, verts, faces, chunk=16384):
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    out = np.empty((len(pts),), dtype=np.float64)
    for s in range(0, len(pts), chunk):
        p = pts[s : s + chunk][:, None, :]
        d = _pt_tri_np(p, a[None], b[None], c[None])
        out[s : s + chunk] = d.min(axis=1)
    return out


def _pt_tri_np(p, a, b, c):
    """Distance from points to triangles (Ericson's closest-point)."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = (ab * ap).sum(-1)
    d2 = (ac * ap).sum(-1)
    bp = p - b
    d3 = (ab * bp).sum(-1)
    d4 = (ac * bp).sum(-1)
    cp = p - c
    d5 = (ab * cp).sum(-1)
    d6 = (ac * cp).sum(-1)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = np.maximum(va + vb + vc, 1e-300)
    v = np.clip(vb / denom, 0, 1)
    w = np.clip(vc / denom, 0, 1)
    # Region clamps
    v = np.where((d1 <= 0) & (d2 <= 0), 0.0, v)
    w = np.where((d1 <= 0) & (d2 <= 0), 0.0, w)
    v = np.where((d3 >= 0) & (d4 <= d3), 1.0, v)
    w = np.where((d3 >= 0) & (d4 <= d3), 0.0, w)
    v = np.where((d6 >= 0) & (d5 <= d6), 0.0, v)
    w = np.where((d6 >= 0) & (d5 <= d6), 1.0, w)
    e_ab = np.clip(np.where(np.abs(d1 - d3) > 1e-300, d1 / np.maximum(d1 - d3, 1e-300), 0), 0, 1)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    v = np.where(on_ab, e_ab, v)
    w = np.where(on_ab, 0.0, w)
    e_ac = np.clip(np.where(np.abs(d2 - d6) > 1e-300, d2 / np.maximum(d2 - d6, 1e-300), 0), 0, 1)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    v = np.where(on_ac, 0.0, v)
    w = np.where(on_ac, e_ac, w)
    e_bc = np.clip((d4 - d3) / np.maximum((d4 - d3) + (d5 - d6), 1e-300), 0, 1)
    on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)
    v = np.where(on_bc, 1.0 - e_bc, v)
    w = np.where(on_bc, e_bc, w)
    closest = a + v[..., None] * ab + w[..., None] * ac
    return np.linalg.norm(p - closest, axis=-1)
