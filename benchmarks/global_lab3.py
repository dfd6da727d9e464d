"""Attribute the full per-ADMM-iteration cost at 160k tets.

global_lab/global_lab2 (r3) established the banded A-apply at ~5 us and
the Pallas prox at ~1.2 ms, yet the full iteration measures ~10.3 ms
(97.5 iters/s with admm_iters=10). This lab closes the attribution gap:
every piece of the iteration body (stencil Dx, stencil D^T W^2, fused
local step, CG-per-iteration, CG fixed overhead, scan overhead) is timed
with the slope protocol (DESIGN.md "Measurement methodology") — fused
lax.scan at TWO lengths with a data-dependent carry and full-reduction
forcing, so enqueue-only timings, flat readback, and constant folding all
cancel. The in-situ per-ADMM-iteration cost comes from a second slope:
the production fused rollout run at two admm_iters values.

Usage: bash benchmarks/tpu_run.sh /tmp/lab3.log 900 120 \
    python -u benchmarks/global_lab3.py [--nx 80 --ny 20 --nz 20]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope(make_loop, n_lo=8, n_hi=40, reps=4):
    """Per-iteration seconds via two-length fused scans, best-of-reps.

    make_loop(n) must return a jitted fn x -> x' running the body n
    times with a data-dependent carry. Each rep re-perturbs the input so
    XLA cannot cache across calls.
    """
    import jax
    import jax.numpy as jnp

    lo, hi = make_loop(n_lo), make_loop(n_hi)
    best_lo = best_hi = 1e9
    x0 = None
    for r in range(reps + 1):
        # Varying input each rep; scalar readback forces completion.
        seed = np.float32(1.0 + 1e-6 * r)
        t0 = time.perf_counter()
        out = lo(seed)
        float(jnp.sum(out))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = hi(seed)
        float(jnp.sum(out))
        t_hi = time.perf_counter() - t0
        if r == 0:
            continue  # warmup/compile rep
        best_lo = min(best_lo, t_lo)
        best_hi = min(best_hi, t_hi)
    return (best_hi - best_lo) / (n_hi - n_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=80)
    ap.add_argument("--ny", type=int, default=20)
    ap.add_argument("--nz", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jnp.asarray([1.0]).block_until_ready()
    print(f"handshake ok: {jax.devices()}", flush=True)

    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.geometry.factory import make_tet_blocks
    from admm_elastic_tpu.solvers import pcg as pcg_mod
    from admm_elastic_tpu.system import system as sysm

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
    n = solver._n_verts
    system = solver.system
    data = solver._solve_data
    print(f"init {time.perf_counter()-t0:.1f}s n_verts={n} "
          f"n_tets={len(mesh.tets)} bands={len(data.band_offsets)} "
          f"rest_K={int(data.ell_cols.shape[1])}", flush=True)

    rng = np.random.default_rng(0)
    x_base = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    tiny = np.float32(1e-20)

    def scan_of(body):
        """make_loop factory: seed -> scan(body) over x carry."""
        def make(nlen):
            @jax.jit
            def loop(seed):
                def f(c, _):
                    return body(c), None
                out, _ = jax.lax.scan(f, x_base * seed, None, length=nlen)
                return out
            return loop
        return make

    def report(name, t, note=""):
        print(f"{name:26s} {t*1e6:9.1f} us  {note}", flush=True)

    # 0. Carry/scan overhead floor.
    report("scan+axpy floor", slope(scan_of(lambda x: x * np.float32(1.0 + 1e-9))))

    # 1. Banded A apply (the CG operator).
    report("banded A apply", slope(scan_of(
        lambda x: data.apply(x) * tiny + x)))

    # 2. Element-path A apply = stencil Dx + D^T W^2 (local+rhs traffic).
    report("element A_mv (Dx+Dt)", slope(scan_of(
        lambda x: sysm.A_mv(system, x) * tiny + x)))

    # 3. Stencil Dx alone (full-reduction forcing).
    def dx_body(x):
        rows = sysm.Dx(system, x)
        acc = sum(jnp.sum(r) for r in rows)
        return x * (np.float32(1.0) + tiny * acc)
    report("stencil Dx", slope(scan_of(dx_body)))

    # 4. Full local step (Dx + fused Pallas prox + dual update).
    z0 = sysm.zeros_like_Dx(system, jnp.float32)

    def local_body(x):
        z, u = sysm.local_step(system, x, z0, [jnp.zeros_like(z) for z in z0],
                               n_newton_iters=8)
        acc = sum(jnp.sum(a) for a in z) + sum(jnp.sum(a) for a in u)
        return x * (np.float32(1.0) + tiny * acc)
    report("local step (Dx+prox)", slope(scan_of(local_body), n_lo=4, n_hi=16))

    # 5. rhs (D^T W^2 (z-u) + M x_bar) with z,u derived from the carry.
    M_xbar = system.masses[:, None] * x_base

    def rhs_body(x):
        rows = sysm.Dx(system, x)  # stand-in for (z-u), same shapes
        return sysm.rhs(system, M_xbar, rows,
                        [jnp.zeros_like(r) for r in rows]) * tiny + x
    report("Dx + rhs(DtW2)", slope(scan_of(rhs_body)))

    # 6. CG: fixed-count solves at two max_iters (tol=0 disables the early
    # exit) -> per-CG-iteration cost including the while_loop reality.
    precond = data.precondition()

    def cg_body(k):
        def body(x):
            xx, _ = pcg_mod.solve(data.apply, precond, x, jnp.zeros_like(x),
                                  0.0, k)
            return xx * tiny + x
        return body
    t_cg10 = slope(scan_of(cg_body(10)), n_lo=4, n_hi=16)
    t_cg40 = slope(scan_of(cg_body(40)), n_lo=4, n_hi=16)
    per_it = (t_cg40 - t_cg10) / 30.0
    report("cg solve @10", t_cg10)
    report("cg solve @40", t_cg40)
    report("cg per-iteration", per_it,
           f"(fixed overhead ~{(t_cg10 - 10 * per_it) * 1e6:.0f} us)")

    # 7. Realistic CG iteration count: one production step, then read the
    # inner-iteration counter (admm_iters=10 -> counts 10 solves).
    solver.step()
    inner = solver.runtime_data().inner_iters
    print(f"production inner CG iters: {inner} over 10 ADMM iters "
          f"(~{inner/10:.1f}/solve)", flush=True)

    # 8. In-situ per-ADMM-iteration: production rollout at two admm_iters.
    def run_t(n_admm, steps):
        solver.m_settings.admm_iters = n_admm
        solver.run(1)  # compile/warm at this (static-shape-free) setting
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            solver.run(steps)
            float(jnp.sum(solver.state.x))
            best = min(best, time.perf_counter() - t0)
        return best

    steps = 8
    t5 = run_t(5, steps)
    t20 = run_t(20, steps)
    per_admm = (t20 - t5) / (15 * steps)
    print(f"production per-ADMM-iter: {per_admm*1e3:.2f} ms "
          f"(t5={t5:.2f}s t20={t20:.2f}s over {steps} steps; "
          f"per-step overhead ~{(t5/steps - 5*per_admm)*1e3:.2f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
