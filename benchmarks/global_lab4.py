"""In-situ bisection of the production ADMM iteration at 160k tets.

global_lab3 (r3) measured the pieces of the iteration in isolated scans:
local 758 us + rhs 1303 us + CG ~30 us ~= 2 ms — but the production fused
rollout costs 10.26 ms per ADMM iteration. Something about the composed
program costs 5x the sum of its parts. This lab finds it by construction:
monkeypatch each phase of the admm body to a shape-preserving no-op and
re-measure the production slope (solver.run at admm_iters 5 vs 20). The
difference full - variant is that phase's REAL in-situ cost, including
whatever fusion/scheduling behavior it only exhibits inside the big
program. (Numerics are garbage under the patches; only timing matters.)

Usage: bash benchmarks/tpu_run.sh /tmp/lab4.log 3600 120 \
    python -u benchmarks/global_lab4.py [--nx 80 --ny 20 --nz 20]
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
    from admm_elastic_tpu import solver as solver_mod
    from admm_elastic_tpu.geometry.factory import make_tet_blocks
    from admm_elastic_tpu.solvers import pcg as pcg_mod
    from admm_elastic_tpu.system import system as sysm

    mesh = make_tet_blocks(args.nx, args.ny, args.nz)
    mesh.flags = binding.NOSELFCOLLISION | binding.NEOHOOKEAN

    # --- patches -----------------------------------------------------------
    orig_local = sysm.local_step
    orig_dx = sysm.Dx
    orig_rhs = sysm.rhs
    orig_pcg = pcg_mod.solve
    orig_detect = solver_mod._detect

    def local_skip(system, x, z, u, n_newton_iters=8):
        return z, u

    def local_dx_only(system, x, z, u, n_newton_iters=8):
        dix = sysm.Dx(system, x)
        return dix, u

    def rhs_skip(system, M_xbar, z_list, u_list):
        return M_xbar

    def pcg_skip(A_mv, precond, b, x0, tol, max_iters):
        return x0 + 1e-12 * b, jnp.asarray(0, jnp.int32)

    def pcg_fixed_n(n_force):
        def f(A_mv, precond, b, x0, tol, max_iters):
            return orig_pcg(A_mv, precond, b, x0, 0.0, n_force)
        return f

    variants = [
        ("full", {}),
        ("no-local(identity)", {"local_step": local_skip}),
        ("local=Dx only", {"local_step": local_dx_only}),
        ("no-rhs(M_xbar)", {"rhs": rhs_skip}),
        ("no-global(x0)", {"pcg": pcg_skip}),
        ("global=CG@10 fixed", {"pcg": pcg_fixed_n(10)}),
        ("body floor(all skipped)", {
            "local_step": local_skip, "rhs": rhs_skip, "pcg": pcg_skip}),
    ]

    solver = Solver()
    binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
    pins = [int(i) for i in np.where(mesh.vertices[:, 0] < 1e-9)[0]]
    solver.set_pins(pins)
    st = Settings(verbose=0, admm_iters=10, linsolver=3,
                  dtype=np.float32, pcg_precond="jacobi",
                  pcg_max_iters=60, pcg_tol=1e-6)
    t0 = time.perf_counter()
    assert solver.initialize(st)
    t_init = time.perf_counter() - t0
    print(f"init {t_init:.0f}s", flush=True)

    for name, patch in variants:
        sysm.local_step = patch.get("local_step", orig_local)
        sysm.rhs = patch.get("rhs", orig_rhs)
        pcg_mod.solve = patch.get("pcg", orig_pcg)
        # The module-level jits cache on shapes, not on the monkeypatched
        # functions — stale entries would serve the previous variant.
        solver_mod._run_impl.clear_cache()
        solver_mod._step_impl.clear_cache()

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

        t5 = run_t(5, args.steps)
        t20 = run_t(20, args.steps)
        per = (t20 - t5) / (15 * args.steps)
        print(f"{name:26s} per-ADMM-iter {per*1e3:7.2f} ms  "
              f"(t5={t5:.2f}s t20={t20:.2f}s)", flush=True)

    sysm.local_step = orig_local
    sysm.Dx = orig_dx
    sysm.rhs = orig_rhs
    pcg_mod.solve = orig_pcg
    solver_mod._detect = orig_detect


if __name__ == "__main__":
    main()
