"""Prox accuracy/speed tradeoff: SVD sweeps x Newton iterations.

Post flat-stencil the fused Pallas hyperelastic prox is the dominant
cost of large elastic steps (~0.75 of ~1.0 ms/ADMM-iter at 160k tets,
global_lab3 r3b) and is VPU-compute-bound: ~8 Jacobi sweeps + 8 Newton
iterations per element. This lab measures, on the production rollout,
what cheaper inner budgets buy and what they cost in trajectory error
vs the default budget (30 steps from rest; crossval's backend-noise
scale for this class of scene is ~1e-5..1e-3 relative).

Usage: bash benchmarks/tpu_run.sh /tmp/prox_lab.log 3600 300 \
    python -u benchmarks/prox_lab.py
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jnp.asarray([1.0]).block_until_ready()
    print(f"handshake ok: {jax.devices()}", flush=True)

    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu import solver as solver_mod
    from admm_elastic_tpu.geometry.factory import make_tet_blocks
    from admm_elastic_tpu.ops import pallas_kernels as pk

    orig = pk.local_step_tet_hyper_pallas

    mesh = make_tet_blocks(80, 20, 20)
    mesh.flags = binding.NOSELFCOLLISION | binding.NEOHOOKEAN
    solver = Solver()
    binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
    pins = [int(i) for i in np.where(mesh.vertices[:, 0] < 1e-9)[0]]
    solver.set_pins(pins)
    st = Settings(verbose=0, admm_iters=10, linsolver=3, dtype=np.float32,
                  pcg_precond="jacobi", pcg_max_iters=60, pcg_tol=1e-6)
    assert solver.initialize(st)
    x0 = np.asarray(solver.x)
    v0 = np.asarray(solver.v)

    def run_variant(sweeps, newton, steps=30):
        pk.local_step_tet_hyper_pallas = functools.partial(orig, sweeps=sweeps)
        solver.m_settings.prox_newton_iters = newton
        solver_mod._run_impl.clear_cache()
        solver_mod._step_impl.clear_cache()
        solver.x = x0
        solver.v = v0
        solver.run(steps)
        jax.block_until_ready(solver.state.x)
        x_end = np.asarray(solver.x)
        # Timed slope: admm 5 vs 20 over 8-step rollouts.
        def run_t(n_admm, n):
            solver.m_settings.admm_iters = n_admm
            solver.run(1)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                solver.run(n)
                float(jnp.sum(solver.state.x))
                best = min(best, time.perf_counter() - t0)
            return best
        t5, t20 = run_t(5, 8), run_t(20, 8)
        solver.m_settings.admm_iters = 10
        per = (t20 - t5) / (15 * 8)
        return x_end, per

    x_ref, t_ref = run_variant(8, 8)
    scale = np.abs(x_ref).max()
    print(json.dumps({"sweeps": 8, "newton": 8,
                      "ms_per_admm_iter": round(t_ref * 1e3, 3),
                      "rel_err_vs_default": 0.0}), flush=True)
    for sweeps, newton in ((6, 6), (4, 4), (3, 2)):
        x_end, per = run_variant(sweeps, newton)
        err = float(np.abs(x_end - x_ref).max() / scale)
        print(json.dumps({"sweeps": sweeps, "newton": newton,
                          "ms_per_admm_iter": round(per * 1e3, 3),
                          "rel_err_vs_default": err}), flush=True)
    pk.local_step_tet_hyper_pallas = orig


if __name__ == "__main__":
    main()
