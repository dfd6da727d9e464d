"""Pallas flat-stencil D/Dᵀ kernels: interpreter-mode exactness vs jnp.

ops/pallas_stencil.py runs the same multiply-add sequence as the jnp flat
stencil (ops/stencil.py) inside one pallas_call; the CPU suite proves the
two paths agree in the Pallas interpreter, including the dead-lane
identity-F injection, the non-zero vertex_offset embedding, and a full
solver step (reference semantics: src/Solver.cpp:84-98).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from admm_elastic_tpu.geometry.factory import make_tet_blocks
from admm_elastic_tpu.materials import Lame
from admm_elastic_tpu.ops import pallas_kernels, pallas_stencil, stencil
from admm_elastic_tpu.system import elements as el


@pytest.fixture(autouse=True)
def _interpret_mode():
    pallas_kernels.set_pallas_mode("interpret")
    yield
    pallas_kernels.set_pallas_mode("auto")


def _flat_batch(nx, ny, nz, off=0, seed=3):
    mesh = make_tet_blocks(nx, ny, nz)
    b = el.build_tet_batch(mesh.vertices, mesh.tets, Lame.soft_rubber(),
                           "neohookean", vertex_offset=off,
                           lattice_dims=mesh.lattice_dims)
    assert b.stencil is not None
    assert pallas_stencil.eligible(b, np.float64)  # interpret mode: any dtype
    rng = np.random.default_rng(seed)
    n = off + len(mesh.vertices)
    return b, rng, n


@pytest.mark.parametrize("dims,off", [((5, 4, 3), 0), ((4, 2, 2), 11)])
def test_dx_kernel_matches_jnp(dims, off):
    b, rng, n = _flat_batch(*dims, off=off)
    x = jnp.asarray(rng.standard_normal((n, 3)))
    got = np.asarray(pallas_stencil.tet_Dx_rows(x, b))
    want = np.asarray(stencil.tet_Dx_rows(x, b))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("dims,off", [((5, 4, 3), 0), ((4, 2, 2), 11)])
def test_rhs_kernel_matches_jnp(dims, off):
    b, rng, n = _flat_batch(*dims, off=off)
    t = b.inds.shape[0]
    z = jnp.asarray(rng.standard_normal((9, t)))
    u = jnp.asarray(rng.standard_normal((9, t)))
    got = np.asarray(pallas_stencil.tet_rhs_rows(z, u, b, n))
    w2 = (b.weight * b.weight)[None, :]
    want = np.asarray(stencil.tet_Dt_rows(w2 * (z - u), b, n))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_eligibility_gates():
    b, _, _ = _flat_batch(4, 2, 2)
    assert pallas_stencil.eligible(b, np.float32)
    pallas_stencil.set_stencil_kernel_mode("off")
    try:
        assert not pallas_stencil.eligible(b, np.float32)
    finally:
        pallas_stencil.set_stencil_kernel_mode("auto")
    # Wrap (ring) families keep exact modular addressing on the jnp path.
    from admm_elastic_tpu.geometry.factory import make_tet_torus
    torus = make_tet_torus(n_ring=8, n_sec=2)
    bw = el.build_tet_batch(torus.vertices, torus.tets, Lame.soft_rubber(),
                            "neohookean", lattice_dims=torus.lattice_dims,
                            lattice_wrap=True)
    assert bw.stencil is not None and bw.stencil[-1]
    assert not pallas_stencil.eligible(bw, np.float32)


def test_full_step_matches_jnp_stencil():
    """One pinned-beam solver step: Pallas stencil kernels vs jnp stencil."""
    from admm_elastic_tpu import Settings, Solver, binding

    def run():
        solver = Solver()
        mesh = make_tet_blocks(4, 2, 2)
        mesh.flags = binding.NEOHOOKEAN | binding.NOSELFCOLLISION
        binding.add_tetmesh(solver, mesh, verbose=False)
        solver.set_pins([0, 2])
        solver.initialize(Settings(linsolver=0, admm_iters=4, verbose=0))
        for _ in range(3):
            solver.step()
        return np.asarray(solver.x)

    x_pallas = run()
    pallas_stencil.set_stencil_kernel_mode("off")
    try:
        x_jnp = run()
    finally:
        pallas_stencil.set_stencil_kernel_mode("auto")
    np.testing.assert_allclose(x_pallas, x_jnp, rtol=1e-10, atol=1e-12)
