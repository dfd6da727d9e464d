"""In-situ bisection of the ADMM iteration at FLAGSHIP (bench.py) scale.

The headline bench is the 5000-tet NH beam with the prefactored dense
inverse (ls=0, direct_mode="inv"): 16.2k ADMM iters/s = 62 us/iter on one
v5e chip. global_lab3-6 attributed the 160k-tet iteration (stencil-bound);
nothing has attributed the small-scene iteration, where fixed per-op
overheads and the Precision.HIGHEST inverse matmul (6-pass f32 emulation,
solvers/direct.py:101-108) could dominate. Same protocol as global_lab4:
monkeypatch each phase to a shape-preserving no-op, re-measure the
production slope (solver.run at admm_iters 5 vs 20 x fixed steps), and
read each phase's real in-situ cost as full - variant. Numerics are
garbage under the knockouts; only timing matters. Precision variants
(default/HIGH) are numerically live but NOT crossval-safe — measurement
only, the production kernel stays HIGHEST unless a variant is proven
both faster and trajectory-clean.

Usage: bash benchmarks/tpu_run.sh /tmp/flagship_lab.log 3600 300 \
    python -u benchmarks/flagship_lab.py
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=40)
    ap.add_argument("--ny", type=int, default=5)
    ap.add_argument("--nz", type=int, default=5)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jnp.asarray([1.0]).block_until_ready()
    print(f"handshake ok: {jax.devices()}", flush=True)

    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu import solver as solver_mod
    from admm_elastic_tpu.geometry.factory import make_tet_blocks
    from admm_elastic_tpu.solvers import direct as direct_mod
    from admm_elastic_tpu.system import system as sysm

    # --- patches -----------------------------------------------------------
    orig_local = sysm.local_step
    orig_rhs = sysm.rhs
    orig_solve = direct_mod.solve
    orig_polish = direct_mod.polish

    def local_skip(system, x, z, u, n_newton_iters=8):
        return z, u

    def local_dx_only(system, x, z, u, n_newton_iters=8):
        return sysm.Dx(system, x), u

    def rhs_skip(system, M_xbar, z_list, u_list):
        return M_xbar

    def solve_skip(data, b):
        return b * (1.0 + 1e-12)

    def solve_precision(prec):
        def f(data, b):
            assert data.mode == "inv"
            return data.scale * jnp.matmul(
                data.mat, data.scale * b, precision=prec)
        return f

    def polish_skip(data, x, b, sweeps=2):
        return x

    variants = [
        ("full", {}),
        ("no-local(identity)", {"local_step": local_skip}),
        ("local=Dx only", {"local_step": local_dx_only}),
        ("no-rhs(M_xbar)", {"rhs": rhs_skip}),
        ("no-global(b)", {"solve": solve_skip}),
        ("no-polish", {"polish": polish_skip}),
        ("global@default-prec", {"solve": solve_precision(jax.lax.Precision.DEFAULT)}),
        ("global@HIGH-prec", {"solve": solve_precision(jax.lax.Precision.HIGH)}),
        ("body floor(all skipped)", {
            "local_step": local_skip, "rhs": rhs_skip,
            "solve": solve_skip, "polish": polish_skip}),
    ]

    mesh = make_tet_blocks(args.nx, args.ny, args.nz)
    mesh.flags = binding.NOSELFCOLLISION | binding.NEOHOOKEAN
    solver = Solver()
    binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
    pins = [int(i) for i in np.where(mesh.vertices[:, 0] < 1e-9)[0]]
    solver.set_pins(pins)
    st = Settings(verbose=0, admm_iters=10, linsolver=0,
                  gravity=-9.8, dtype=np.float32, direct_mode="inv")
    t0 = time.perf_counter()
    assert solver.initialize(st)
    print(f"init {time.perf_counter()-t0:.0f}s "
          f"(V={solver.x.shape[0]}, T={mesh.tets.shape[0]})", flush=True)

    rows = []

    def run_t(n_admm, steps):
        solver.m_settings.admm_iters = n_admm
        solver.run(1)
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            solver.run(steps)
            float(jnp.sum(solver.state.x))
            best = min(best, time.perf_counter() - t0)
        return best

    for unroll in (False, True):
        solver.m_settings.unroll_admm = unroll
        for name, patch in variants:
            if unroll and name != "full":
                continue
            sysm.local_step = patch.get("local_step", orig_local)
            sysm.rhs = patch.get("rhs", orig_rhs)
            direct_mod.solve = patch.get("solve", orig_solve)
            direct_mod.polish = patch.get("polish", orig_polish)
            # Module-level jits cache on shapes, not on the monkeypatched
            # functions — stale entries would serve the previous variant.
            solver_mod._run_impl.clear_cache()
            solver_mod._step_impl.clear_cache()

            t5 = run_t(5, args.steps)
            t20 = run_t(20, args.steps)
            per = (t20 - t5) / (15 * args.steps)
            fixed = t5 / args.steps - 5 * per  # per-step non-iter overhead
            tag = f"{name}{' +unroll' if unroll else ''}"
            print(f"{tag:28s} per-ADMM-iter {per*1e6:7.1f} us  "
                  f"per-step fixed {fixed*1e6:7.1f} us  "
                  f"(t5={t5:.2f}s t20={t20:.2f}s)", flush=True)
            rows.append({"variant": tag, "per_iter_us": round(per * 1e6, 1),
                         "per_step_fixed_us": round(fixed * 1e6, 1)})

    sysm.local_step = orig_local
    sysm.rhs = orig_rhs
    direct_mod.solve = orig_solve
    direct_mod.polish = orig_polish

    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
