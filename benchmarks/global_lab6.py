"""Is the traced-bound admm fori_loop the 5x composition overhead?

global_lab5: the exact admm body under a static-length lax.scan costs
2.37 ms/iter at 160k tets; the production rollout costs 10.3. The
remaining structural difference is the loop plumbing: production runs
fori_loop(admm_iters) with a TRACED bound (no recompiles when iters
change) nested inside the steps loop. This lab measures the production
rollout with unroll_admm on (static python unroll -> recompile per
admm_iters) vs off, plus a static-scan step variant, same slope protocol.

Usage: bash benchmarks/tpu_run.sh /tmp/lab6.log 3600 200 \
    python -u benchmarks/global_lab6.py
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=80)
    ap.add_argument("--ny", type=int, default=20)
    ap.add_argument("--nz", type=int, default=20)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jnp.asarray([1.0]).block_until_ready()
    print(f"handshake ok: {jax.devices()}", flush=True)

    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.geometry.factory import make_tet_blocks

    mesh = make_tet_blocks(args.nx, args.ny, args.nz)
    mesh.flags = binding.NOSELFCOLLISION | binding.NEOHOOKEAN
    solver = Solver()
    binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
    pins = [int(i) for i in np.where(mesh.vertices[:, 0] < 1e-9)[0]]
    solver.set_pins(pins)
    st = Settings(verbose=0, admm_iters=10, linsolver=3, dtype=np.float32,
                  pcg_precond="jacobi", pcg_max_iters=60, pcg_tol=1e-6)
    t0 = time.perf_counter()
    assert solver.initialize(st)
    print(f"init {time.perf_counter()-t0:.0f}s", flush=True)

    def run_t(n_admm, steps):
        solver.m_settings.admm_iters = n_admm
        solver.run(1)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            solver.run(steps)
            float(jnp.sum(solver.state.x))
            best = min(best, time.perf_counter() - t0)
        return best

    for unroll in (False, True):
        solver.m_settings.unroll_admm = unroll
        t5 = run_t(5, args.steps)
        t20 = run_t(20, args.steps)
        per = (t20 - t5) / (15 * args.steps)
        print(f"unroll_admm={unroll!s:5s} per-ADMM-iter {per*1e3:7.2f} ms "
              f"(t5={t5:.2f}s t20={t20:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
