"""Two-grid PCG preconditioner: correctness against the dense solve."""

import numpy as np
import jax.numpy as jnp

from admm_elastic_tpu import Lame, Settings, Solver, binding
from admm_elastic_tpu.geometry.factory import make_tet_blocks
from admm_elastic_tpu.solvers import pcg as pcg_mod
from admm_elastic_tpu.system import assembly


def _beam_system():
    mesh = make_tet_blocks(8, 3, 3)
    mesh.flags = binding.NOSELFCOLLISION | binding.NEOHOOKEAN
    s = Solver()
    binding.add_tetmesh(s, mesh, Lame.soft_rubber(), verbose=False)
    s.set_pins([0, 1, 2])
    st = Settings(verbose=0, linsolver=3, dtype=np.float64)
    assert s.initialize(st)
    return s


def test_twogrid_solves_to_dense():
    s = _beam_system()
    system = s.system
    a_dense = np.asarray(assembly.assemble_dense(system), np.float64)
    n = a_dense.shape[0]
    rng = np.random.default_rng(0)
    b = rng.standard_normal((n, 3))
    x_true = np.linalg.solve(a_dense, b)

    for precond in ("jacobi", "twogrid"):
        data = pcg_mod.prepare(system, np.float64, precond=precond)
        x, iters = pcg_mod.solve(
            data.apply, data.precondition(), jnp.asarray(b),
            jnp.zeros((n, 3)), 1e-12, 500,
        )
        err = np.abs(np.asarray(x) - x_true).max() / np.abs(x_true).max()
        assert err < 1e-8, (precond, err)

    # Two-grid must not need more iterations than Jacobi.
    dj = pcg_mod.prepare(system, np.float64, precond="jacobi")
    dt = pcg_mod.prepare(system, np.float64, precond="twogrid")
    _, it_j = pcg_mod.solve(dj.apply, dj.precondition(), jnp.asarray(b),
                            jnp.zeros((n, 3)), 1e-10, 500)
    _, it_t = pcg_mod.solve(dt.apply, dt.precondition(), jnp.asarray(b),
                            jnp.zeros((n, 3)), 1e-10, 500)
    assert int(it_t) <= int(it_j), (int(it_t), int(it_j))


def test_aggregates_partition():
    s = _beam_system()
    adj = assembly.vertex_adjacency(s.system)
    agg = assembly.greedy_aggregates(adj, target_size=16)
    n = s.system.n_verts
    assert agg.shape == (n,)
    assert agg.min() == 0
    # Every cluster non-empty and ids contiguous.
    c = int(agg.max()) + 1
    counts = np.bincount(agg, minlength=c)
    assert (counts > 0).all()
    # Coarse matrix is SPD.
    a_c = assembly.coarse_matrix(s.system, agg)
    w = np.linalg.eigvalsh(a_c)
    assert w.min() > 0
