"""A/B the Pallas flat-stencil D/Dᵀ kernels at flagship (bench.py) scale.

flagship_lab attributed ~26 us of the 5k-tet ADMM iteration to Dx+rhs —
a chain of dependent XLA fusions over [cells]-length vectors whose fixed
dispatch costs dominate at this size. ops/pallas_stencil.py collapses
each apply into one pallas_call. This lab measures the production
iteration slope (solver.run, admm_iters 5 vs 20 x fixed steps) with the
kernels on vs off on the same process, plus an on-chip trajectory
agreement probe (the CPU-side exactness proof is
tests/test_pallas_stencil.py; the committed gate is crossval).

Usage: bash benchmarks/tpu_run.sh /tmp/stencil_kernel_lab.log 3600 300 \
    python -u benchmarks/stencil_kernel_lab.py --out benchmarks/STENCIL_KERNEL_LAB_r5.json
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
    from admm_elastic_tpu.ops import pallas_stencil
    from admm_elastic_tpu.system import system as sysm

    def build():
        mesh = make_tet_blocks(args.nx, args.ny, args.nz)
        mesh.flags = binding.NOSELFCOLLISION | binding.NEOHOOKEAN
        solver = Solver()
        binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
        pins = [int(i) for i in np.where(mesh.vertices[:, 0] < 1e-9)[0]]
        solver.set_pins(pins)
        st = Settings(verbose=0, admm_iters=10, linsolver=0,
                      gravity=-9.8, dtype=np.float32, direct_mode="inv")
        assert solver.initialize(st)
        return solver

    # NOTE: the committed STENCIL_KERNEL_LAB_r5.json carries a third row
    # from the session that ALSO measured the (since removed) local+rhs
    # megakernel: there "nofuse" = today's production split and "auto" =
    # the megakernel (98.1 us/iter — 2.1x slower, rejected; see
    # ops/pallas_stencil.py).
    rows = []
    traj = {}
    for mode in ("off", "auto"):
        pallas_stencil.set_stencil_kernel_mode(mode)
        solver_mod._run_impl.clear_cache()
        solver_mod._step_impl.clear_cache()
        solver = build()
        b = solver.system.tets[0]
        print(f"mode={mode} eligible="
              f"{pallas_stencil.eligible(b, np.float32)}", flush=True)

        # Trajectory probe: 50 steps from rest.
        t0 = time.perf_counter()
        solver.run(50)
        traj[mode] = np.asarray(solver.x)
        print(f"  probe rollout ok ({time.perf_counter()-t0:.0f}s incl "
              "compile)", flush=True)

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

        t5 = run_t(5, args.steps)
        t20 = run_t(20, args.steps)
        per = (t20 - t5) / (15 * args.steps)
        fixed = t5 / args.steps - 5 * per
        print(f"  kernels={mode:4s} per-ADMM-iter {per*1e6:7.1f} us  "
              f"per-step fixed {fixed*1e6:7.1f} us  "
              f"(t5={t5:.2f}s t20={t20:.2f}s)", flush=True)
        rows.append({"variant": f"stencil-kernels-{mode}",
                     "per_iter_us": round(per * 1e6, 1),
                     "per_step_fixed_us": round(fixed * 1e6, 1)})

    scale = float(np.max(np.abs(traj["off"])))
    d = float(np.max(np.abs(traj["auto"] - traj["off"])))
    print(f"trajectory agreement after 50 steps: max|dx| = {d:.3e} "
          f"(scale {scale:.3e})", flush=True)
    rows.append({"probe": "traj50_maxabs_dx", "value": d, "scale": scale})

    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
