"""Banded DIA+rest SpMV plan: exactness vs the plain ELL apply."""

import numpy as np

from admm_elastic_tpu.ops import spmv


def _random_ell(n=300, k=9, seed=0, scramble=False, pattern="lattice"):
    rng = np.random.default_rng(seed)
    if pattern == "lattice":
        # 1D-ish lattice with a few fixed offsets: the banded-friendly case.
        offs = np.array([-31, -30, -1, 1, 30, 31, 60])
        cols = (np.arange(n)[:, None] + offs[None, :k]) % n
    else:
        cols = rng.integers(0, n, (n, k))
    vals = rng.standard_normal((n, k))
    vals[rng.random((n, k)) < 0.2] = 0.0  # padding holes
    if scramble:
        perm = rng.permutation(n)
        iperm = np.empty(n, np.int64)
        iperm[perm] = np.arange(n)
        cols = iperm[cols][perm]
        vals = vals[perm]
    return cols.astype(np.int32), vals


def _ell_apply(cols, vals, x):
    return np.einsum("nk,nkc->nc", vals, x[cols])


def test_band_split_exact_lattice():
    cols, vals = _random_ell(pattern="lattice", k=7)
    plan = spmv.plan_bands(cols, vals)
    assert plan.perm is None  # native order is already banded
    # The test lattice wraps with % n, so a handful of boundary entries
    # sit off the 7 main diagonals and land in the rest-ELL.
    assert plan.coverage > 0.99
    assert plan.rest_cols.shape[1] <= 2
    x = np.random.default_rng(1).standard_normal((cols.shape[0], 3))
    np.testing.assert_allclose(
        spmv.apply_bands_ref(plan, x), _ell_apply(cols, vals, x),
        rtol=1e-12, atol=1e-12)


def test_band_split_periodic_goes_circular():
    """A wrapping (periodic) lattice: the seam entries merge into the
    main diagonals mod N — zero rest, exact circular apply."""
    cols, vals = _random_ell(pattern="lattice", k=7)
    plan = spmv.plan_bands(cols, vals)
    assert plan.circular
    assert plan.rest_cols.shape[1] == 0
    assert plan.coverage == 1.0
    x = np.random.default_rng(7).standard_normal((cols.shape[0], 3))
    np.testing.assert_allclose(
        spmv.apply_bands_ref(plan, x), _ell_apply(cols, vals, x),
        rtol=1e-12, atol=1e-12)


def test_band_split_scrambled_uses_rcm():
    cols, vals = _random_ell(pattern="lattice", k=7, scramble=True)
    plan = spmv.plan_bands(cols, vals)
    assert plan.perm is not None  # scrambled order needs the permutation
    assert plan.coverage > 0.5
    x = np.random.default_rng(2).standard_normal((cols.shape[0], 3))
    np.testing.assert_allclose(
        spmv.apply_bands_ref(plan, x), _ell_apply(cols, vals, x),
        rtol=1e-12, atol=1e-12)


def test_band_split_random_falls_back_to_rest():
    # A random graph has no popular diagonals: everything lands in the
    # rest-ELL and the apply still matches exactly.
    cols, vals = _random_ell(pattern="random", k=5)
    plan = spmv.plan_bands(cols, vals)
    x = np.random.default_rng(3).standard_normal((cols.shape[0], 3))
    np.testing.assert_allclose(
        spmv.apply_bands_ref(plan, x), _ell_apply(cols, vals, x),
        rtol=1e-12, atol=1e-12)


def test_band_split_empty():
    cols = np.zeros((4, 1), np.int32)
    vals = np.zeros((4, 1))
    plan = spmv.plan_bands(cols, vals)
    x = np.ones((4, 3))
    np.testing.assert_allclose(spmv.apply_bands_ref(plan, x), 0.0)


def _small_system():
    import numpy as np

    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.geometry.factory import make_tet_blocks

    mesh = make_tet_blocks(6, 3, 3)
    mesh.flags = binding.NOSELFCOLLISION | binding.LINEAR
    s = Solver()
    binding.add_tetmesh(s, mesh, Lame.soft_rubber(), verbose=False)
    pins = [int(i) for i in np.where(mesh.vertices[:, 0] < 1e-9)[0]]
    s.set_pins(pins)
    st = Settings(verbose=0, admm_iters=2, linsolver=3)
    assert s.initialize(st)
    return s


def test_pcgdata_banded_apply_matches_ell():
    """The production banded/DIA apply is bit-for-bit the same operator as
    the ELL row gather (same entries, different storage)."""
    import jax.numpy as jnp
    import numpy as np

    from admm_elastic_tpu.solvers import pcg

    s = _small_system()
    d_ell = pcg.prepare(s.system, jnp.float64, spmv_format="ell")
    d_band = pcg.prepare(s.system, jnp.float64, spmv_format="auto")
    assert d_band.bands is not None, "lattice mesh should take the DIA path"
    assert d_band.perm is None, "lattice order is already banded"
    # Full coverage on a lattice: the rest-ELL should be empty or thin.
    assert d_band.ell_cols.shape[1] <= 2

    rng = np.random.default_rng(0)
    for _ in range(3):
        x = jnp.asarray(rng.standard_normal((s._n_verts, 3)))
        a = np.asarray(d_ell.apply(x))
        b = np.asarray(d_band.apply(x))
        np.testing.assert_allclose(b, a, rtol=1e-13, atol=1e-13)
        a = np.asarray(d_ell.apply(x, scale=2.5))
        b = np.asarray(d_band.apply(x, scale=2.5))
        np.testing.assert_allclose(b, a, rtol=1e-13, atol=1e-13)


def test_pcgdata_banded_apply_matches_ell_scrambled():
    """Scrambled vertex order: prepare() must route through RCM and the
    permuted banded apply must still equal the ELL oracle."""
    import jax.numpy as jnp
    import numpy as np

    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.geometry.factory import make_tet_blocks
    from admm_elastic_tpu.solvers import pcg

    mesh = make_tet_blocks(6, 3, 3)
    rng = np.random.default_rng(1)
    perm = rng.permutation(len(mesh.vertices))
    iperm = np.empty_like(perm)
    iperm[perm] = np.arange(len(perm))
    mesh.vertices = mesh.vertices[perm]
    mesh.tets = iperm[mesh.tets]
    mesh.flags = binding.NOSELFCOLLISION | binding.LINEAR
    s = Solver()
    binding.add_tetmesh(s, mesh, Lame.soft_rubber(), verbose=False)
    st = Settings(verbose=0, admm_iters=2, linsolver=3)
    assert s.initialize(st)

    d_ell = pcg.prepare(s.system, jnp.float64, spmv_format="ell")
    d_band = pcg.prepare(s.system, jnp.float64, spmv_format="auto")
    if d_band.bands is not None:
        assert d_band.perm is not None, "scrambled order needs RCM"
    x = jnp.asarray(rng.standard_normal((s._n_verts, 3)))
    np.testing.assert_allclose(np.asarray(d_band.apply(x)),
                               np.asarray(d_ell.apply(x)),
                               rtol=1e-13, atol=1e-13)
