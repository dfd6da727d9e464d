"""Anderson acceleration ON CHIP: does aa_window=4 beat plain ADMM at
equal wall-clock on the stiff NH beam (VERDICT r3 weak #7)?

The r3 per-budget study (DESIGN.md "Anderson acceleration") is f64 CPU;
this lab re-runs it on the real TPU in f32 and adds the missing axis:
the measured per-iteration COST of the AA update (window products + a
small lstsq), so the win is stated at equal wall-clock, not equal
iteration count.

Protocol: stiff NH beam (16x4x4 blocks, E=1e7 nu=0.45), ls=0 (the
prefactored equilibrated-inverse mode — the flagship's global solver at
small/medium sizes). Error = max |x - x_ref| after ONE step from rest,
x_ref from a 2000-iteration step (both f32 on chip). Cost = calibrated
ms/step of a fused rollout at admm_iters=30 (plain vs aa) -> overhead
ratio r. Verdict row: aa@N error vs plain@ceil(N*r) error.

Solver-mode scope (measured on CPU first, r4): the AA gain LIVES IN THE
EXACT-GLOBAL-SOLVE MODES. With ls=3 the inner PCG is truncated (tol/cap)
and warm-started from the previous iterate, so the ADMM map becomes
history-dependent and AA's secant model sees inner-solve noise: measured
gain 6.8x at ls=0/f64 vs 0.88-1.02x at ls=3 (f64 AND f32, loose and
tight inner tol). That is a property of warm-started inexact ADMM, not
of the chip.

Usage: bash benchmarks/tpu_run.sh /tmp/anderson_lab.log 3000 600 \
    python -u benchmarks/anderson_lab.py [--out FILE]
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matrix import _time  # noqa: E402


def build(admm_iters, aa_window, np, dims=(16, 4, 4)):
    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.geometry.factory import make_tet_blocks

    mesh = make_tet_blocks(*dims)
    mesh.flags = binding.NOSELFCOLLISION | binding.NEOHOOKEAN
    solver = Solver()
    lame = Lame.from_youngs_poisson(1e7, 0.45)  # the stiff r3 study row
    binding.add_tetmesh(solver, mesh, lame, verbose=False)
    pins = [int(i) for i in np.where(mesh.vertices[:, 0] < 1e-9)[0]]
    solver.set_pins(pins)
    st = Settings(verbose=0, admm_iters=admm_iters, linsolver=0,
                  dtype=np.float32, direct_mode="inv",
                  aa_window=aa_window)
    assert solver.initialize(st)
    return solver


def one_step_x(admm_iters, aa_window, np, jax, dims=(16, 4, 4)):
    s = build(admm_iters, aa_window, np, dims)
    s.step()
    jax.block_until_ready(s.state.x)
    return np.asarray(s.x, np.float64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--dims", type=int, nargs=3, default=[16, 4, 4])
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jnp.asarray([1.0]).block_until_ready()
    print(f"handshake ok: {jax.devices()}", file=sys.stderr, flush=True)

    dims = tuple(args.dims)
    x_ref = one_step_x(2000, 0, np, jax, dims)

    # Cost: calibrated rollouts at admm_iters=30.
    ms_plain = _time(build(30, 0, np, dims), steps=10, target_s=0.5) * 1e3
    ms_aa = _time(build(30, 4, np, dims), steps=10, target_s=0.5) * 1e3
    r = ms_aa / ms_plain
    print(json.dumps({"ms_per_step_30it_plain": round(ms_plain, 3),
                      "ms_per_step_30it_aa4": round(ms_aa, 3),
                      "aa_cost_ratio": round(r, 3)}), flush=True)

    errs = {}
    budgets = sorted({10, 30, math.ceil(10 * r), math.ceil(30 * r)})
    for it in budgets:
        errs[("plain", it)] = float(
            np.abs(one_step_x(it, 0, np, jax, dims) - x_ref).max())
    for it in (10, 30):
        errs[("aa4", it)] = float(
            np.abs(one_step_x(it, 4, np, jax, dims) - x_ref).max())
    rows = [{"cfg": k[0], "admm_iters": k[1], "err_vs_converged": f"{v:.3e}"}
            for k, v in sorted(errs.items())]
    for row in rows:
        print(json.dumps(row), flush=True)

    verdict = []
    for it in (10, 30):
        eq = math.ceil(it * r)
        gain = errs[("plain", eq)] / max(errs[("aa4", it)], 1e-300)
        verdict.append({
            "aa4_iters": it, "equal_wallclock_plain_iters": eq,
            "err_aa4": f"{errs[('aa4', it)]:.3e}",
            "err_plain_equal_cost": f"{errs[('plain', eq)]:.3e}",
            "gain_at_equal_wallclock": round(gain, 2)})
        print(json.dumps(verdict[-1]), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"cost": {"ms_plain": ms_plain, "ms_aa": ms_aa,
                                "ratio": r},
                       "rows": rows, "verdict": verdict}, f, indent=1)


if __name__ == "__main__":
    main()
