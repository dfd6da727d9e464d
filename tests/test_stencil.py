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


def _grid_tris_imajor(nx, ny):
    """matrix.py _cloth_solver layout: vid = i*(ny+1)+j, cells i-outer."""
    vid = lambda i, j: i * (ny + 1) + j
    tris = []
    for i in range(nx):
        for j in range(ny):
            tris.append([vid(i, j), vid(i + 1, j), vid(i, j + 1)])
            tris.append([vid(i + 1, j), vid(i + 1, j + 1), vid(i, j + 1)])
    return np.asarray(tris), (nx + 1) * (ny + 1)


def test_verify_tri_grid_detects_and_rejects():
    from admm_elastic_tpu.geometry.factory import make_plane, make_sphere

    # i-major sheet (the cloth-bench layout).
    tris, nv = _grid_tris_imajor(5, 3)
    meta = stencil.verify_tri_grid(tris, n_local_verts=nv)
    assert meta is not None
    base, g0, g1, slow_major, pats = meta
    assert (base, g0, g1, slow_major) == (0, 6, 4, True)
    assert len(pats) == 2
    # make_plane layout (j-outer cells, vid = j*(nx+1)+i).
    plane = make_plane(4, 6)
    meta2 = stencil.verify_tri_grid(plane.faces,
                                    n_local_verts=len(plane.vertices))
    assert meta2 is not None
    # Permuted triangle order breaks the cell-major contract.
    rng = np.random.default_rng(0)
    assert stencil.verify_tri_grid(
        tris[rng.permutation(len(tris))], n_local_verts=nv) is None
    # An unstructured mesh is rejected.
    sph = make_sphere((0, 0, 0), 1.0, subdiv=8)
    assert stencil.verify_tri_grid(
        sph.faces, n_local_verts=len(sph.vertices)) is None


def test_tri_stencil_dx_dt_match_gather():
    import jax.numpy as jnp

    from admm_elastic_tpu.geometry.factory import make_plane

    for tris, nv in (_grid_tris_imajor(5, 4),
                     (lambda p: (p.faces, len(p.vertices)))(make_plane(4, 5))):
        meta = stencil.verify_tri_grid(tris, n_local_verts=nv)
        assert meta is not None
        t = len(tris)
        rng = np.random.default_rng(1)
        dlocal = jnp.asarray(rng.standard_normal((t, 3, 2)))
        inds = jnp.asarray(tris, jnp.int32)
        x = jnp.asarray(rng.standard_normal((nv, 3)))

        np.testing.assert_allclose(
            np.asarray(stencil.tri_Dx_rows(x, meta, dlocal)),
            np.asarray(red.tri_Dx_rows(x, inds, dlocal)),
            rtol=1e-12, atol=1e-12)
        g = jnp.asarray(rng.standard_normal((6, t)))
        gi = jnp.asarray(red.build_gather_table(tris, nv))
        np.testing.assert_allclose(
            np.asarray(stencil.tri_Dt_rows(g, meta, dlocal, nv)),
            np.asarray(red.tri_Dt_rows(g, inds, dlocal, nv, gi)),
            rtol=1e-12, atol=1e-12)


def test_tri_stencil_offset_family():
    import jax.numpy as jnp

    tris, nv = _grid_tris_imajor(3, 4)
    off = 23
    meta = stencil.verify_tri_grid(tris, base=off, n_local_verts=nv)
    assert meta is not None
    n_total = off + nv + 7
    t = len(tris)
    rng = np.random.default_rng(2)
    dlocal = jnp.asarray(rng.standard_normal((t, 3, 2)))
    inds = jnp.asarray(tris + off, jnp.int32)
    x = jnp.asarray(rng.standard_normal((n_total, 3)))
    np.testing.assert_allclose(
        np.asarray(stencil.tri_Dx_rows(x, meta, dlocal)),
        np.asarray(red.tri_Dx_rows(x, inds, dlocal)),
        rtol=1e-12, atol=1e-12)
    g = jnp.asarray(rng.standard_normal((6, t)))
    np.testing.assert_allclose(
        np.asarray(stencil.tri_Dt_rows(g, meta, dlocal, n_total)),
        np.asarray(red.tri_Dt_rows(g, inds, dlocal, n_total)),
        rtol=1e-12, atol=1e-12)


def test_tri_stencil_full_step_trajectory_matches(monkeypatch):
    """End-to-end cloth: auto-detected stencil vs forced gather path."""
    from admm_elastic_tpu import Lame, Settings, Solver
    from admm_elastic_tpu.geometry.mesh import lumped_masses_tri

    def run(use_stencil, monkeypatch):
        if not use_stencil:
            monkeypatch.setenv("ADMM_TPU_NO_STENCIL", "1")
        else:
            monkeypatch.delenv("ADMM_TPU_NO_STENCIL", raising=False)
        nx = ny = 6
        verts = np.array(
            [[i, 0.0, j] for i in range(nx + 1) for j in range(ny + 1)],
            dtype=np.float64)
        tris, _ = _grid_tris_imajor(nx, ny)
        s = Solver()
        s.add_nodes(verts, lumped_masses_tri(verts, tris, 1522.0))
        lame = Lame.from_youngs_poisson(1e7, 0.399)
        lame.limit_min, lame.limit_max = 0.95, 1.05
        s.add_tri_energies(verts, tris, lame)
        s.set_pins([int(i) for i in np.where(verts[:, 0] < 1e-9)[0]])
        st = Settings(verbose=0, admm_iters=5, linsolver=3,
                      dtype=np.float64, pcg_max_iters=40, pcg_tol=1e-10)
        assert s.initialize(st)
        has_stencil = any(b.stencil is not None for b in s.system.tris)
        assert has_stencil == use_stencil
        for _ in range(3):
            s.step()
        return np.array(s.x)

    a = run(True, monkeypatch)
    b = run(False, monkeypatch)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-9)


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
