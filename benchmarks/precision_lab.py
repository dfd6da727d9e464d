"""Accuracy of the prefactored-inverse apply per MXU precision tier.

flagship_lab measured the ls=0 global solve at 12.4 us/iter of the
flagship's 60 us, ~10 us of which is the Precision.HIGHEST 6-pass f32
emulation (solvers/direct.py:101-108); HIGH (3-pass bf16x3) returns 5.5
us/iter (+9% flagship throughput) IF the trajectories stay clean. The
original hazard measurement (CLAUDE.md #1, crossval drift 1e-2 vs 1e-5)
was for DEFAULT (plain bf16 passes), not HIGH. This lab quantifies, at
the bench geometry (40x5x5 NH beam, pinned, inv mode):

1. one-apply relative error of solve(data, b) at DEFAULT / HIGH /
   HIGHEST against the same Binv matmul done in f64 on host (isolates
   MXU arithmetic error; the factorization error is common);
2. TPU trajectory divergence HIGH-vs-HIGHEST after 8 and 200 steps
   (crossval's 8-step bound is 2e-3; DEFAULT is run for scale).

Usage: bash benchmarks/tpu_run.sh /tmp/precision_lab.log 1800 300 \
    python -u benchmarks/precision_lab.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build():
    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.geometry.factory import make_tet_blocks

    mesh = make_tet_blocks(40, 5, 5)
    mesh.flags = binding.NOSELFCOLLISION | binding.NEOHOOKEAN
    solver = Solver()
    binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
    pins = [int(i) for i in np.where(mesh.vertices[:, 0] < 1e-9)[0]]
    solver.set_pins(pins)
    st = Settings(verbose=0, admm_iters=10, linsolver=0,
                  gravity=-9.8, dtype=np.float32, direct_mode="inv")
    assert solver.initialize(st)
    return solver


def main():
    import jax
    import jax.numpy as jnp

    jnp.asarray([1.0]).block_until_ready()
    print(f"handshake ok: {jax.devices()}", flush=True)

    from admm_elastic_tpu.solvers import direct as direct_mod

    solver = build()
    data = solver._solve_data

    # A representative RHS: M x_bar after a short settle (real magnitudes,
    # pin-scaled rows included).
    solver.run(5)
    b = (np.asarray(solver.system.masses)[:, None]
         * np.asarray(solver.x)).astype(np.float32)

    mat64 = np.asarray(data.mat, np.float64)
    s64 = np.asarray(data.scale, np.float64)
    b64 = b.astype(np.float64)
    ref = s64 * (mat64 @ (s64 * b64))
    scale = np.abs(ref).max()

    for prec in ("DEFAULT", "HIGH", "HIGHEST"):
        p = getattr(jax.lax.Precision, prec)
        out = np.asarray(
            jax.jit(lambda m, s, bb: s * jnp.matmul(m, s * bb, precision=p))(
                data.mat, data.scale, jnp.asarray(b)))
        err = np.abs(out - ref).max() / scale
        print(f"one-apply {prec:8s} rel_err {err:.3e}", flush=True)

    # Trajectory divergence vs the HIGHEST production path.
    orig_solve = direct_mod.solve

    def traj(prec, steps):
        from admm_elastic_tpu import solver as solver_mod

        def solve_p(d, bb):
            return d.scale * jnp.matmul(
                d.mat, d.scale * bb,
                precision=getattr(jax.lax.Precision, prec))

        direct_mod.solve = orig_solve if prec == "HIGHEST" else solve_p
        solver_mod._run_impl.clear_cache()
        solver_mod._step_impl.clear_cache()
        s = build()
        s.run(steps)
        direct_mod.solve = orig_solve
        return np.asarray(s.x)

    for steps in (8, 200):
        gold = traj("HIGHEST", steps)
        sc = np.abs(gold).max()
        for prec in ("HIGH", "DEFAULT"):
            x = traj(prec, steps)
            err = np.abs(x - gold).max() / sc
            print(f"traj {steps:3d} steps {prec:8s} vs HIGHEST: "
                  f"rel_err {err:.3e} finite={np.isfinite(x).all()}",
                  flush=True)


if __name__ == "__main__":
    main()
