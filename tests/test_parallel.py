"""Scenario batching + device-mesh sharding (virtual 8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp


def _small_solver():
    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.geometry.factory import make_tet_blocks

    mesh = make_tet_blocks(2, 1, 1)
    mesh.flags = binding.NOSELFCOLLISION | binding.LINEAR
    solver = Solver()
    binding.add_tetmesh(solver, mesh, Lame.from_youngs_poisson(1e6, 0.3), verbose=False)
    solver.set_pins([0])
    s = Settings(verbose=0, admm_iters=5, linsolver=3)
    assert solver.initialize(s)
    return solver


def test_batched_step_matches_single():
    from admm_elastic_tpu.parallel.batch import make_batched_step, make_scenario_batch

    solver = _small_solver()
    state0 = solver.state

    batch = make_scenario_batch(solver, 3)
    step = make_batched_step(solver, mesh=None, donate=False)
    out = step(batch)

    solver.state = state0
    solver.step()
    ref_x = solver.x

    for s in range(3):
        np.testing.assert_allclose(np.asarray(out.x[s]), ref_x, atol=1e-9)


def test_batched_step_parameter_sweep():
    from admm_elastic_tpu.parallel.batch import make_batched_step, make_scenario_batch

    solver = _small_solver()
    S = 4
    batch = make_scenario_batch(
        solver, S,
        stiffness_scale=np.array([0.25, 1.0, 4.0, 1.0]),
        gravity=np.array([-9.8, -9.8, -9.8, -1.0]),
    )
    step = make_batched_step(solver, mesh=None, donate=False)
    out = step(batch)
    x = np.asarray(out.x)
    assert np.isfinite(x).all()
    # Different stiffness/gravity -> different trajectories.
    assert np.abs(x[0] - x[1]).max() > 1e-9
    assert np.abs(x[1] - x[3]).max() > 1e-9
    # Weaker gravity falls less.
    assert x[3][:, 1].min() > x[1][:, 1].min()


def test_stiffness_sweep_keeps_pins_hard():
    """Regression: the sweep must scale *material* stiffness only.

    Scaling the pin diagonal along with diag_stiff made the PCG operator
    disagree with the (unscaled) pin rhs, so pinned vertices settled at
    ~target/scale for scale != 1 (ADVICE round 1, high)."""
    from admm_elastic_tpu.parallel.batch import make_batched_step, make_scenario_batch

    solver = _small_solver()
    target = solver.x[0].copy()
    batch = make_scenario_batch(
        solver, 3, stiffness_scale=np.array([0.25, 1.0, 4.0]))
    step = make_batched_step(solver, mesh=None, donate=False)
    for _ in range(10):
        batch = step(batch)
    x = np.asarray(batch.x)
    for s in range(3):
        np.testing.assert_allclose(x[s, 0], target, atol=1e-6)


def test_sharded_step_on_device_mesh():
    from admm_elastic_tpu.parallel.batch import (
        make_batched_step,
        make_scenario_batch,
        make_sim_mesh,
    )

    assert len(jax.devices()) >= 8, "conftest should create 8 virtual devices"
    mesh = make_sim_mesh(n_scene=4, n_shard=2)
    solver = _small_solver()
    batch = make_scenario_batch(solver, 4)
    step = make_batched_step(solver, mesh=mesh, donate=False)
    out = jax.block_until_ready(step(batch))
    assert np.isfinite(np.asarray(out.x)).all()

    # Matches the unsharded result.
    step1 = make_batched_step(solver, mesh=None, donate=False)
    out1 = step1(make_scenario_batch(solver, 4))
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(out1.x), atol=1e-9)


def test_batched_step_contact_modes():
    """make_batched_step honors the configured solver: AL-PCG (ls=4) and
    Uzawa-with-sparse-inner (ls=2) batch over scenes; the floor is held
    in every scene of a stiffness sweep. (VERDICT r1 item 9.)"""
    from tests.test_contact import drop_box_solver, FLOOR_TOL
    from admm_elastic_tpu.parallel.batch import make_batched_step, make_scenario_batch

    for ls in (4, 2):
        solver = drop_box_solver(linsolver=ls)
        if ls == 2:
            solver.m_settings.uzawa_inner = "pcg"
            assert solver.initialize(solver.m_settings)
        batch = make_scenario_batch(
            solver, 3, stiffness_scale=np.array([0.5, 1.0, 2.0]))
        step = make_batched_step(solver, mesh=None, donate=False)
        for _ in range(40):
            batch = step(batch)
        x = np.asarray(batch.x)
        assert np.isfinite(x).all()
        assert x[..., 1].min() > -0.75 - FLOOR_TOL, (ls, x[..., 1].min())
        assert not np.asarray(batch.overflow).any()


def test_batched_step_rejects_dense_modes():
    import pytest

    from admm_elastic_tpu.parallel.batch import make_batched_step

    solver = _small_solver()
    with pytest.raises(ValueError, match="linsolver"):
        make_batched_step(solver, linsolver=0)


def test_graft_entry():
    import __graft_entry__ as g

    fn, args = g.entry()
    out_state, inner, overflow = jax.jit(fn)(*args)
    assert not bool(overflow)
    assert np.isfinite(np.asarray(out_state.x)).all()
    g.dryrun_multichip(8)
