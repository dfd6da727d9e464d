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


def test_batched_point_collapse_recovers_all_scenes():
    """Inversion recovery through the BATCHED path (VERDICT r3 next #8):
    the bunnyexpand-class robustness machinery (epsilon-inflation, sign
    rectification, sigma<=0 barrier) had only been exercised unbatched.
    Batch the point-collapsed bunny with NH across a stiffness sweep and
    demand finite FULL recovery in every scene."""
    import dataclasses

    from admm_elastic_tpu import Settings, Solver, binding
    from admm_elastic_tpu.geometry.factory import make_tet_bunny_like, make_xform
    from admm_elastic_tpu.geometry.mesh import tet_volumes
    from admm_elastic_tpu.parallel.batch import make_batched_step, make_scenario_batch

    mesh = make_tet_bunny_like(250)
    mesh.flags = binding.NOSELFCOLLISION | binding.NEOHOOKEAN
    mesh.apply_xform(make_xform(rot_deg=20.0, rot_axis=(1, 0, 0)))
    solver = Solver()
    binding.add_tetmesh(solver, mesh, verbose=False)
    assert solver.initialize(Settings(verbose=0, admm_iters=10, linsolver=3,
                                      gravity=0.0, pcg_max_iters=60,
                                      pcg_tol=1e-8))

    S = 3
    batch = make_scenario_batch(solver, S,
                                stiffness_scale=np.array([0.5, 1.0, 2.0]),
                                gravity=np.zeros(S))
    batch = dataclasses.replace(batch, x=jnp.zeros_like(batch.x))
    step = make_batched_step(solver, mesh=None, donate=False)
    for _ in range(80):
        batch = step(batch)
    x = np.asarray(batch.x)
    assert np.isfinite(x).all(), "batched point collapse went non-finite"
    for s in range(S):
        vols = tet_volumes(x[s], mesh.tets)
        bad = int(((vols <= 0) | ~np.isfinite(vols)).sum())
        assert bad == 0, f"scene {s}: {bad} inverted tets after recovery"


def test_batched_point_collapse_through_debloat_rebuild():
    """Same recovery demand through `_debloat_for_throughput`'s REBUILT
    element batches: a heavily-padded lattice (6x3x3: 30.6% stencil
    padding) makes the batching layer rebuild gather-path batches via a
    different constructor path (lattice_dims=None) than single-scene
    init — the rebuilt batches must carry the same NH robustness."""
    import dataclasses

    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.geometry.factory import make_tet_blocks
    from admm_elastic_tpu.geometry.mesh import tet_volumes
    from admm_elastic_tpu.parallel.batch import (
        _debloat_for_throughput, make_batched_step, make_scenario_batch)

    mesh = make_tet_blocks(6, 3, 3)
    mesh.flags = binding.NOSELFCOLLISION | binding.NEOHOOKEAN
    solver = Solver()
    binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
    assert solver.initialize(Settings(verbose=0, admm_iters=10, linsolver=3,
                                      gravity=0.0, pcg_max_iters=60,
                                      pcg_tol=1e-8))
    assert solver.system.tets[0].stencil is not None
    assert _debloat_for_throughput(solver, solver.system) is not solver.system, \
        "expected the debloat rebuild path (padding > 15%)"

    S = 2
    batch = make_scenario_batch(solver, S,
                                stiffness_scale=np.array([1.0, 2.0]),
                                gravity=np.zeros(S))
    batch = dataclasses.replace(batch, x=jnp.zeros_like(batch.x))
    step = make_batched_step(solver, mesh=None, donate=False)
    for _ in range(80):
        batch = step(batch)
    x = np.asarray(batch.x)
    assert np.isfinite(x).all()
    for s in range(S):
        vols = tet_volumes(x[s], mesh.tets)
        bad = int(((vols <= 0) | ~np.isfinite(vols)).sum())
        assert bad == 0, f"scene {s}: {bad} inverted tets after recovery"


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


def test_batched_step_compacted_mesh_obstacle():
    """Batched scenes over a near-lane-compacted exact mesh obstacle: the
    top_k compaction + scatter-back must vmap cleanly, every scene of a
    stiffness sweep must rest ON the slab, and overflow stays clear.
    Also pins the batched == single-scene equality through the compacted
    detection path (vmapped lane indices must not leak across scenes)."""
    import dataclasses

    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.collision.passive import PassiveMeshExact
    from admm_elastic_tpu.geometry.factory import make_tet_blocks, make_xform
    from admm_elastic_tpu.parallel.batch import (make_batched_step,
                                                 make_scenario_batch)

    def build():
        obs = make_tet_blocks(4, 2, 4, cell=0.5)
        obs.apply_xform(make_xform(trans=(0.0, -1.0, 0.0)))
        exact = PassiveMeshExact.from_tet_mesh(
            obs.vertices, obs.tets, cells=24, near_lanes=24)
        mesh = make_tet_blocks(3, 2, 2, cell=0.4)
        mesh.flags = binding.NOSELFCOLLISION | binding.LINEAR
        mesh.apply_xform(make_xform(trans=(0.4, 0.6, 0.4)))
        solver = Solver()
        binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
        solver.add_obstacle(exact)
        st = Settings(verbose=0, admm_iters=10, linsolver=4, gravity=-9.8)
        assert solver.initialize(st)
        return solver

    solver = build()
    state0 = solver.state
    batch = make_scenario_batch(
        solver, 3, stiffness_scale=np.array([0.5, 1.0, 2.0]))
    step = make_batched_step(solver, mesh=None, donate=False)
    for _ in range(30):
        batch = step(batch)
    x = np.asarray(batch.x)
    assert np.isfinite(x).all()
    # Resting ON the slab top (y=0) in every scene of the sweep.
    assert x[..., 1].min() > -0.05, x[..., 1].min()
    assert x[..., 1].min() < 0.05
    assert not np.asarray(batch.overflow).any()

    # Scene 1 (scale 1.0) == the single-scene solver, step for step.
    solver.state = state0
    solver.run(30)
    np.testing.assert_allclose(x[1], np.asarray(solver.x), atol=1e-9)
