"""Native (C++) host helpers match their Python fallbacks exactly."""

import numpy as np
import pytest

import admm_elastic_tpu.native as nat
import admm_elastic_tpu.system.assembly as asm


def _adjacency():
    import jax.numpy as jnp

    from admm_elastic_tpu.geometry.factory import make_tet_blocks
    from admm_elastic_tpu.materials import Lame
    from admm_elastic_tpu.system.elements import build_tet_batch
    from admm_elastic_tpu.system.system import System

    mesh = make_tet_blocks(6, 3, 3)
    tb = build_tet_batch(mesh.vertices, mesh.tets, Lame.rubber())
    n = mesh.vertices.shape[0]
    system = System(masses=jnp.ones(n), tets=(tb,), tris=(), pins=None, dt=1 / 24)
    return asm.vertex_adjacency(system)


def _python_only(fn, *args):
    """Run an assembly function with the native path disabled."""
    orig_a = nat.greedy_aggregates_native
    orig_c = nat.greedy_coloring_native

    def boom(*a, **k):
        raise RuntimeError("disabled")

    nat.greedy_aggregates_native = boom
    nat.greedy_coloring_native = boom
    try:
        return fn(*args)
    finally:
        nat.greedy_aggregates_native = orig_a
        nat.greedy_coloring_native = orig_c


def test_native_matches_python():
    adj = _adjacency()
    try:
        a_nat = nat.greedy_aggregates_native(adj, 24)
        c_nat = nat.greedy_coloring_native(adj)
    except RuntimeError:
        pytest.skip("libgeomcore.so not buildable in this environment")
    a_py = _python_only(asm.greedy_aggregates, adj, 24)
    c_py = _python_only(asm.greedy_coloring, adj)
    assert np.array_equal(a_nat, a_py)
    assert np.array_equal(c_nat, c_py)
    # Coloring is proper: no adjacent vertices share a color.
    for v, nbrs in enumerate(adj):
        assert all(c_nat[v] != c_nat[u] for u in nbrs)
