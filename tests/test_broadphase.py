"""Hash-grid broad phase for self-collision: exact agreement with dense."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import admm_elastic_tpu.collision.dynamic as dyn
from admm_elastic_tpu.collision.dynamic import detect_dynamic, make_tet_mesh_collider
from admm_elastic_tpu.geometry.factory import make_tet_blocks
from admm_elastic_tpu.geometry.mesh import surface_faces_from_tets, surface_vertex_indices


def _folded(n):
    """A block grid folded onto itself in x: many real self-penetrations."""
    mesh = make_tet_blocks(n, n, n)
    faces = surface_faces_from_tets(mesh.tets)
    col = make_tet_mesh_collider(mesh.vertices, mesh.tets, faces, 0, dtype=np.float64)
    x = mesh.vertices.astype(np.float64).copy()
    x[:, 0] = np.abs(x[:, 0] - n / 2 - 0.2) * 0.9
    surf = surface_vertex_indices(mesh.tets)
    return col, jnp.asarray(x), jnp.asarray(x[surf]), jnp.asarray(surf, jnp.int32)


def test_broad_matches_dense_exactly():
    col, xj, qp, qv = _folded(8)  # 2560 tets
    old = dyn.BROADPHASE_MIN_TETS
    try:
        dyn.BROADPHASE_MIN_TETS = 1  # force broad
        rb = jax.jit(lambda: detect_dynamic(col, xj, qp, qv))()
        dyn.BROADPHASE_MIN_TETS = 10**9  # force dense
        rd = jax.jit(lambda: detect_dynamic(col, xj, qp, qv))()
    finally:
        dyn.BROADPHASE_MIN_TETS = old
    assert int(rd["mask"].sum()) > 50, "fixture produced too few hits"
    assert not bool(rb["broad_overflow"].any()), "cell capacity overflowed"
    assert bool(jnp.array_equal(rb["mask"], rd["mask"]))
    m = np.asarray(rd["mask"])
    assert bool(jnp.array_equal(rb["face"][m], rd["face"][m]))
    np.testing.assert_allclose(
        np.asarray(rb["barys"])[m], np.asarray(rd["barys"])[m], atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(rb["dx"])[m], np.asarray(rd["dx"])[m], atol=1e-12
    )


def test_rest_cell_cap_bounds():
    mesh = make_tet_blocks(4, 4, 4)
    cap = dyn._rest_cell_cap(mesh.vertices, mesh.tets)
    assert 8 <= cap <= 48
