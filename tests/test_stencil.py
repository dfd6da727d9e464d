"""Gather-free stencil D/D^T for lattice meshes: detection + exactness."""

import numpy as np

from admm_elastic_tpu.geometry.factory import make_tet_blocks
from admm_elastic_tpu.ops import reduction as red
from admm_elastic_tpu.ops import stencil


def test_verify_lattice_detects_and_rejects():
    mesh = make_tet_blocks(4, 3, 2)
    meta = stencil.verify_lattice(mesh.tets, mesh.lattice_dims)
    assert meta is not None
    base, X, Y, Z, pe, po = meta
    assert (base, X, Y, Z) == (0, 5, 4, 3)
    # Any permutation of tet order breaks the cell-major layout contract.
    rng = np.random.default_rng(0)
    assert stencil.verify_lattice(
        mesh.tets[rng.permutation(len(mesh.tets))], mesh.lattice_dims) is None
    # Wrong dims are rejected.
    assert stencil.verify_lattice(mesh.tets, (3, 4, 2)) is None


def test_stencil_dx_dt_match_gather():
    import jax.numpy as jnp

    mesh = make_tet_blocks(5, 4, 3)
    meta = stencil.verify_lattice(mesh.tets, mesh.lattice_dims)
    n = len(mesh.vertices)
    t = len(mesh.tets)
    rng = np.random.default_rng(1)
    dlocal = jnp.asarray(rng.standard_normal((t, 4, 3)))
    inds = jnp.asarray(mesh.tets, jnp.int32)
    x = jnp.asarray(rng.standard_normal((n, 3)))

    rows_ref = np.asarray(red.tet_Dx_rows(x, inds, dlocal))
    rows_st = np.asarray(stencil.tet_Dx_rows(x, meta, dlocal))
    np.testing.assert_allclose(rows_st, rows_ref, rtol=1e-12, atol=1e-12)

    g = jnp.asarray(rng.standard_normal((9, t)))
    gi = jnp.asarray(red.build_gather_table(mesh.tets, n))
    dt_ref = np.asarray(red.tet_Dt_rows(g, inds, dlocal, n, gi))
    dt_st = np.asarray(stencil.tet_Dt_rows(g, meta, dlocal, n))
    np.testing.assert_allclose(dt_st, dt_ref, rtol=1e-12, atol=1e-12)


def test_stencil_offset_family():
    """Second mesh staged at a vertex offset (boxes scene layout)."""
    import jax.numpy as jnp

    mesh = make_tet_blocks(3, 2, 2)
    off = 37
    meta = stencil.verify_lattice(mesh.tets, mesh.lattice_dims, base=off)
    n_total = off + len(mesh.vertices) + 11
    tq = len(mesh.tets)
    rng = np.random.default_rng(2)
    dlocal = jnp.asarray(rng.standard_normal((tq, 4, 3)))
    inds = jnp.asarray(mesh.tets + off, jnp.int32)
    x = jnp.asarray(rng.standard_normal((n_total, 3)))

    np.testing.assert_allclose(
        np.asarray(stencil.tet_Dx_rows(x, meta, dlocal)),
        np.asarray(red.tet_Dx_rows(x, inds, dlocal)),
        rtol=1e-12, atol=1e-12)
    g = jnp.asarray(rng.standard_normal((9, tq)))
    np.testing.assert_allclose(
        np.asarray(stencil.tet_Dt_rows(g, meta, dlocal, n_total)),
        np.asarray(red.tet_Dt_rows(g, inds, dlocal, n_total)),
        rtol=1e-12, atol=1e-12)


def test_stencil_full_step_trajectory_matches():
    """End-to-end: binding path (stencil auto-on) vs explicit gather path
    on the same beam — trajectories agree to solver roundoff."""
    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.geometry.mesh import lumped_masses_tet

    def run(use_stencil):
        mesh = make_tet_blocks(6, 3, 3)
        mesh.flags = binding.NOSELFCOLLISION | binding.NEOHOOKEAN
        s = Solver()
        if use_stencil:
            binding.add_tetmesh(s, mesh, Lame.soft_rubber(), verbose=False)
        else:
            masses = lumped_masses_tet(mesh.vertices, mesh.tets, 1522.0)
            s.add_nodes(mesh.vertices, masses)
            s.add_tet_energies(mesh.vertices, mesh.tets, Lame.soft_rubber(),
                               model="neohookean", lattice_dims=None)
        pins = [int(i) for i in np.where(mesh.vertices[:, 0] < 1e-9)[0]]
        s.set_pins(pins)
        st = Settings(verbose=0, admm_iters=5, linsolver=3,
                      dtype=np.float64, pcg_max_iters=40, pcg_tol=1e-10)
        assert s.initialize(st)
        has_stencil = any(b.stencil is not None for b in s.system.tets)
        assert has_stencil == use_stencil
        for _ in range(3):
            s.step()
        return np.array(s.x)

    a = run(True)
    b = run(False)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-9)
