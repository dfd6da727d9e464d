"""Benchmark: ADMM iterations/s on the beam scene (BASELINE.json metric).

Runs the neo-Hookean tet beam (~5k tets) on the available accelerator
(TPU when run under the driver; honors JAX_PLATFORMS) in f32, and prints
ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline divides by the measured reference-CPU number recorded in
benchmarks/BASELINE_MEASURED.json (produced by benchmarks/run_baseline.sh,
which builds the unmodified reference sources with shim headers and runs
the identical scene).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NX, NY, NZ = 40, 5, 5  # 5000 tets, 1476 verts
ADMM_ITERS = 10
N_STEPS = 20  # initial rollout length; calibrated up to >= TARGET_S
TARGET_S = 2.0
# Post-flat-stencil the scene runs ~0.7 ms/step, so reaching TARGET_S
# takes ~3000 steps (the old 1200 cap left the dispatch overhead-limited).
MAX_STEPS = 8000


def _timed(fn, solver):
    import jax

    t0 = time.perf_counter()
    fn()
    jax.block_until_ready(solver.state.x)
    return time.perf_counter() - t0


def _contact_sanity():
    """Tiny floor-contact scene ON THE BENCH BACKEND: guards against
    silent contact miscompiles (an XLA:TPU fusion bug once zeroed the
    floor normals and bodies tunneled through — f32/TPU only, invisible
    to the CPU test suite)."""
    import jax.numpy as jnp

    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.collision.passive import Floor
    from admm_elastic_tpu.geometry.factory import make_tet_blocks

    # 20 steps reach the floor (~11 steps of freefall) and hold; keeps the
    # three compiles + rollouts inside the driver's bench budget even when
    # the tunnel is slow.
    for ls in (1, 2, 4):
        mesh = make_tet_blocks(4, 2, 2)
        mesh.flags = binding.NOSELFCOLLISION | binding.LINEAR
        s = Solver()
        binding.add_tetmesh(s, mesh, Lame.soft_rubber(), verbose=False)
        s.add_obstacle(Floor(y=jnp.asarray(-1.0)))
        st = Settings(verbose=0, admm_iters=10, linsolver=ls,
                      gravity=-9.8, dtype=np.float32, direct_mode="inv")
        assert s.initialize(st)
        s.run(20)
        x = s.x
        assert np.isfinite(x).all(), f"ls={ls}: contact scene non-finite"
        assert x[:, 1].min() > -1.1, (
            f"ls={ls}: tunneled through the floor (min y {x[:, 1].min()})"
        )


def main():
    import jax

    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.geometry.factory import make_tet_blocks

    mesh = make_tet_blocks(NX, NY, NZ)
    mesh.flags = binding.NOSELFCOLLISION | binding.NEOHOOKEAN

    solver = Solver()
    binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
    pins = [int(i) for i in np.where(mesh.vertices[:, 0] < 1e-9)[0]]
    solver.set_pins(pins)

    settings = Settings(
        verbose=0,
        admm_iters=ADMM_ITERS,
        linsolver=0,
        gravity=-9.8,
        dtype=np.float32,
        direct_mode="inv",
    )
    assert solver.initialize(settings)

    # Warmup (compile the fused n-step rollout, then one timed-shape run).
    solver.run(1)
    solver.run(N_STEPS)
    jax.block_until_ready(solver.state.x)

    # Physics sanity after 21 steps: finite state, pinned face held, beam
    # sagged under gravity but did not explode.
    xs = solver.x
    assert np.isfinite(xs).all(), "non-finite state after rollout"
    assert np.abs(xs[pins] - mesh.vertices[pins]).max() < 1e-3, "pins not held"
    assert xs[:, 1].min() > -60.0 and xs[:, 1].min() < mesh.vertices[:, 1].min(), "no sag?"

    # Variance-proofing (VERDICT r2 weak #3): the tunnel's per-dispatch
    # latency varies ~100 ms BETWEEN sessions, so short rollouts record
    # session luck, not device throughput. Calibrate the rollout length
    # until one dispatch costs >= TARGET_S (overhead < ~5%), then take the
    # best of two independent best-of-4 passes and report their spread.
    n_steps = N_STEPS
    t = _timed(lambda: solver.run(n_steps), solver)
    while t < TARGET_S and n_steps < MAX_STEPS:
        grow = max(2.0, TARGET_S / max(t, 1e-3))
        n_steps = min(MAX_STEPS, max(n_steps + 1, int(n_steps * grow)))
        t = _timed(lambda: solver.run(n_steps), solver)

    def best_of(k):
        return min(_timed(lambda: solver.run(n_steps), solver)
                   for _ in range(k))

    walls = [min(t, best_of(3)), best_of(4)]
    assert np.isfinite(solver.x).all(), "non-finite state after timed reps"
    wall = min(walls)
    spread = abs(walls[0] - walls[1]) / wall

    iters_per_s = n_steps * ADMM_ITERS / wall

    vs = None
    base_path = os.path.join(os.path.dirname(__file__), "benchmarks", "BASELINE_MEASURED.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        ref = base.get("admm_iters_per_s")
        if ref:
            vs = iters_per_s / ref

    _contact_sanity()

    print(json.dumps({
        "metric": "ADMM iterations/s, neo-Hookean beam 5000 tets (fp32, 1 chip)",
        "value": round(iters_per_s, 2),
        "unit": "iters/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "rollout_steps": n_steps,
        "pass_spread": round(spread, 4),
    }))


if __name__ == "__main__":
    main()
