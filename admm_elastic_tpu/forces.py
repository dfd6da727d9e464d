"""Explicit (pre-ADMM) forces applied to velocities before prediction.

Reference: src/ExplicitForce.{hpp,cpp}. Explicit forces are applied to v
before computing x_bar (src/Solver.cpp:53-54). WindForce implements the
Wejchert-Haumann (1991) aerodynamics model per triangle; the reference
scatters to nodes under `#pragma omp critical`
(src/ExplicitForce.cpp:95-103), here it is one segment scatter-add.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


class ExplicitForce:
    """Interface: project(dt, x, v, m) -> new v."""

    def project(self, dt, x, v, m):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class WindForce(ExplicitForce):
    """Wejchert-Haumann wind on a triangle list.

    Two application orders:
    - batched (default): every triangle reads the pre-kick velocities and
      the per-triangle forces scatter-add — the parallel, TPU-native form.
    - sequential: each triangle reads velocities already updated by the
      previous triangles, exactly matching the reference's single-threaded
      loop (src/ExplicitForce.cpp:55-104; its OpenMP form races on v, so
      the serial order IS its deterministic semantic). The sequential
      order is Gauss-Seidel-like and noticeably more stable when the kick
      per step approaches the relative wind speed; batched is Jacobi-like
      and prefers several smaller triangles or a gentler alpha.
    """

    tris: jax.Array  # i32 [W, 3]
    direction: jax.Array  # [3]
    alpha_n: float = 1000.0  # normal coupling strength (static)
    sequential: bool = False  # static

    def _tri_force(self, dt, p, vv):
        curr_v = jnp.mean(vv, axis=-2)
        v_r = curr_v - self.direction
        a = p[..., 1, :] - p[..., 0, :]
        bb = p[..., 2, :] - p[..., 0, :]
        n_raw = jnp.cross(a, bb)
        n_len = jnp.linalg.norm(n_raw, axis=-1)
        normal = n_raw / jnp.maximum(n_len, 1e-30)[..., None]
        area = 0.5 * n_len
        v_n = jnp.sum(normal * v_r, axis=-1)
        force = (-self.alpha_n * area * v_n * jnp.abs(v_n))[..., None] * normal
        return force * 0.33 * dt

    def project(self, dt, x, v, m):
        del m
        if self.sequential:
            def body(v_carry, tri):
                force = self._tri_force(dt, x[tri], v_carry[tri])
                return v_carry.at[tri].add(force), None

            v_out, _ = jax.lax.scan(body, v, self.tris)
            return v_out
        p = x[self.tris]  # [W, 3, 3]
        vv = v[self.tris]
        force = self._tri_force(dt, p, vv)
        # Same force added to all three nodes (src/ExplicitForce.cpp:95-102).
        contrib = jnp.broadcast_to(force[:, None, :], vv.shape)
        return v.at[self.tris.reshape(-1)].add(contrib.reshape(-1, 3))


jax.tree_util.register_dataclass(
    WindForce, data_fields=("tris", "direction"), meta_fields=("alpha_n", "sequential")
)


def make_wind_force(tris: np.ndarray, direction=(0.0, 0.0, 0.0), dtype=np.float64,
                    sequential: bool = False) -> WindForce:
    return WindForce(
        sequential=sequential,
        tris=jnp.asarray(np.asarray(tris, dtype=np.int64).reshape(-1, 3), dtype=jnp.int32),
        direction=jnp.asarray(direction, dtype=dtype),
    )
