"""Proof that the shard axis actually partitions (VERDICT r1 item 6).

Three artifacts GSPMD could silently fail on, each asserted directly:
1. per-device addressable shard shapes shrink by the shard factor
   (fails if XLA decides to replicate the vertex dimension),
2. the compiled HLO of the sharded step contains cross-device
   collectives (the gathers/psums the partition requires),
3. the sharded result matches the unsharded one.

Runs on the conftest's 8 virtual CPU devices; the same program drives
real multi-chip slices unchanged (GSPMD is backend-agnostic).
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _beam_solver(nx, ny, nz):
    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.geometry.factory import make_tet_blocks

    mesh = make_tet_blocks(nx, ny, nz)
    mesh.flags = binding.NOSELFCOLLISION | binding.LINEAR
    solver = Solver()
    binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
    pins = [int(i) for i in np.where(mesh.vertices[:, 0] < 1e-9)[0]]
    solver.set_pins(pins)
    s = Settings(verbose=0, admm_iters=3, linsolver=3,
                 pcg_max_iters=20, pcg_tol=1e-6)
    assert solver.initialize(s)
    return solver


def test_shard_axis_partitions_and_communicates():
    from admm_elastic_tpu.parallel.batch import make_batched_step, make_scenario_batch

    assert len(jax.devices()) >= 8
    # 15x7x7 blocks -> 16*8*8 = 1024 verts (divisible by 8), 3675 tets:
    # large enough that replication vs partition is unambiguous in the
    # shard shapes, small enough for the CPU-device suite.
    solver = _beam_solver(15, 7, 7)
    n_verts = solver._n_verts
    assert n_verts == 1024

    n_shard = 8
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(1, n_shard),
                axis_names=("scene", "shard"))
    batch = make_scenario_batch(solver, 1)
    step = make_batched_step(solver, mesh=mesh, donate=False)

    # (1) Placed input shards shrink along the vertex axis.
    x_sharded = jax.device_put(
        batch.x, NamedSharding(mesh, P("scene", "shard", None)))
    shard_shapes = {s.data.shape for s in x_sharded.addressable_shards}
    assert shard_shapes == {(1, n_verts // n_shard, 3)}, shard_shapes

    # (2) The compiled partitioned program communicates: GSPMD must have
    # inserted collectives for the element gathers / CG dot products.
    # If it silently replicated, the HLO would contain none.
    compiled = step.lower(batch).compile()
    hlo = compiled.as_text()
    collectives = [op for op in
                   ("all-reduce", "all-gather", "collective-permute",
                    "reduce-scatter", "all-to-all")
                   if op in hlo]
    assert collectives, "no cross-device collectives in the sharded step HLO"

    # (3) Output keeps the sharding (per-device buffers stay 1/8th) and
    # matches the unsharded run.
    out = jax.block_until_ready(step(batch))
    out_shapes = {s.data.shape for s in out.x.addressable_shards}
    assert out_shapes == {(1, n_verts // n_shard, 3)}, out_shapes

    step1 = make_batched_step(solver, mesh=None, donate=False)
    out1 = step1(make_scenario_batch(solver, 1))
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(out1.x),
                               atol=1e-9)


def test_shard_stencil_lattice_partitions_and_matches():
    """The flat-stencil D/D^T under a GSPMD shard axis (VERDICT r3 weak #5).

    The 15x7x7 lattices in the other sharding proofs carry ~23% stencil
    padding, which trips `_debloat_for_throughput`'s 15% threshold and
    silently rebuilds gather-path batches — so the static-slice stencil
    addressing (lax.slice / pad / concatenate on the vertex stream) had
    never compiled under a shard axis. This lattice (7x12x12: 14.8%
    padding, 1352 verts % 8 == 0) survives the debloat; the test asserts
    retention explicitly, then collectives + partitioned shards + sharded
    == unsharded.
    """
    from admm_elastic_tpu.parallel.batch import (
        _debloat_for_throughput, make_batched_step, make_scenario_batch)

    solver = _beam_solver(7, 12, 12)
    n_verts = solver._n_verts
    assert n_verts == 1352
    # Stencil detected at build AND retained by the batching debloat.
    assert solver.system.tets[0].stencil is not None
    assert _debloat_for_throughput(solver, solver.system) is solver.system, \
        "stencil batches were debloated — the test no longer covers them"

    n_shard = 8
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(1, n_shard),
                axis_names=("scene", "shard"))
    batch = make_scenario_batch(solver, 1)
    step = make_batched_step(solver, mesh=mesh, donate=False)

    hlo = step.lower(batch).compile().as_text()
    assert any(op in hlo for op in
               ("all-reduce", "all-gather", "collective-permute",
                "reduce-scatter", "all-to-all")), \
        "no cross-device collectives in the sharded stencil step HLO"

    out = jax.block_until_ready(step(batch))
    shapes = {s.data.shape for s in out.x.addressable_shards}
    assert shapes == {(1, n_verts // n_shard, 3)}, shapes

    step1 = make_batched_step(solver, mesh=None, donate=False)
    out1 = step1(make_scenario_batch(solver, 1))
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(out1.x),
                               atol=1e-9)


def test_shard_wrap_stencil_torus_partitions_and_matches():
    """The PERIODIC (ring) stencil under a GSPMD shard axis: the torus
    wrap-extended concat + fold-back addressing (ops/stencil.py wrap=True)
    and the circular mod-N bands have their own sharding interaction, not
    covered by the plain lattice. n_ring=8, n_sec=12: 14.8% padding
    (debloat-retained), 1352 verts % 8 == 0."""
    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.geometry.factory import make_tet_torus
    from admm_elastic_tpu.parallel.batch import (
        _debloat_for_throughput, make_batched_step, make_scenario_batch)

    mesh_geo = make_tet_torus(n_ring=8, n_sec=12)
    mesh_geo.flags = binding.NOSELFCOLLISION | binding.NEOHOOKEAN
    solver = Solver()
    binding.add_tetmesh(solver, mesh_geo, Lame.soft_rubber(), verbose=False)
    solver.set_pins(list(range(13 * 13)))
    s = Settings(verbose=0, admm_iters=2, linsolver=3,
                 pcg_max_iters=15, pcg_tol=1e-6)
    assert solver.initialize(s)
    n_verts = solver._n_verts
    assert n_verts == 1352
    meta = solver.system.tets[0].stencil
    assert meta is not None and meta[-1] is True, "expected a wrap stencil"
    assert _debloat_for_throughput(solver, solver.system) is solver.system

    n_shard = 8
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(1, n_shard),
                axis_names=("scene", "shard"))
    batch = make_scenario_batch(solver, 1)
    step = make_batched_step(solver, mesh=mesh, donate=False)

    hlo = step.lower(batch).compile().as_text()
    assert any(op in hlo for op in
               ("all-reduce", "all-gather", "collective-permute",
                "reduce-scatter", "all-to-all")), \
        "no cross-device collectives in the sharded wrap-stencil HLO"

    out = jax.block_until_ready(step(batch))
    shapes = {sh.data.shape for sh in out.x.addressable_shards}
    assert shapes == {(1, n_verts // n_shard, 3)}, shapes

    step1 = make_batched_step(solver, mesh=None, donate=False)
    out1 = step1(make_scenario_batch(solver, 1))
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(out1.x),
                               atol=1e-9)


def test_shard_fallback_warns_on_indivisible(recwarn):
    """N % n_shard != 0 falls back to scene-only sharding — loudly
    (VERDICT r1 item 9: the silent fallback)."""
    import warnings

    from admm_elastic_tpu.parallel.batch import make_batched_step, make_scenario_batch

    solver = _beam_solver(2, 1, 1)  # 12 verts, not divisible by 8
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(1, 8),
                axis_names=("scene", "shard"))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        step = make_batched_step(solver, mesh=mesh, donate=False)
        assert any("shard" in str(x.message) for x in w), \
            "indivisible shard fallback must warn"
    out = step(make_scenario_batch(solver, 2))
    assert np.isfinite(np.asarray(out.x)).all()


def test_shard_contact_alpcg_partitions_and_matches():
    """Multi-device CONTACT: floor + AL-PCG (ls=4) through the
    (scene x shard) mesh (VERDICT r2 item 9 — the sharding proof only
    covered the contact-free PCG path)."""
    import jax.numpy as jnp

    from admm_elastic_tpu import Floor, Lame, Settings, Solver, binding
    from admm_elastic_tpu.geometry.factory import make_tet_blocks
    from admm_elastic_tpu.parallel.batch import (make_batched_step,
                                                 make_scenario_batch)

    mesh_geo = make_tet_blocks(15, 7, 7)
    mesh_geo.flags = binding.NOSELFCOLLISION | binding.LINEAR
    solver = Solver()
    binding.add_tetmesh(solver, mesh_geo, Lame.soft_rubber(), verbose=False)
    solver.add_obstacle(Floor(y=jnp.asarray(-0.25)))
    s = Settings(verbose=0, admm_iters=3, linsolver=4,
                 pcg_max_iters=20, pcg_tol=1e-6)
    assert solver.initialize(s)
    n_verts = solver._n_verts
    assert n_verts == 1024

    n_shard = 8
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(1, n_shard),
                axis_names=("scene", "shard"))
    batch = make_scenario_batch(solver, 1)
    step = make_batched_step(solver, mesh=mesh, donate=False)

    compiled = step.lower(batch).compile()
    hlo = compiled.as_text()
    assert any(op in hlo for op in
               ("all-reduce", "all-gather", "collective-permute",
                "reduce-scatter", "all-to-all")), \
        "no cross-device collectives in the sharded contact step HLO"

    # Drive several steps so bodies actually reach the floor and the
    # multiplier state y is exercised through the sharded path.
    out = batch
    for _ in range(6):
        out = step(out)
    out = jax.block_until_ready(out)
    shard_shapes = {sh.data.shape for sh in out.x.addressable_shards}
    assert shard_shapes == {(1, n_verts // n_shard, 3)}, shard_shapes

    step1 = make_batched_step(solver, mesh=None, donate=False)
    out1 = make_scenario_batch(solver, 1)
    for _ in range(6):
        out1 = step1(out1)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(out1.x),
                               atol=1e-7)
    # Contact actually engaged: nothing tunneled through the floor.
    assert float(np.asarray(out.x)[..., 1].min()) > -0.35
