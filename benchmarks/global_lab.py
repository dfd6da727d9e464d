"""Decompose the big-mesh global step cost on the real chip.

The r3 SpMV lab showed the raw ELL gather apply at 160k-tet scale runs at
~15 us (at the HBM roofline) in natural lattice order -- so the ~30 ms
per ADMM iteration recorded for beam-nh-160k is NOT the SpMV. This lab
builds the real 160k-tet system and times each piece of the global step
separately (fused N-apply rollouts so tunnel dispatch is amortized):

  - PCGData.apply (ELL gather SpMV)
  - two-grid preconditioner apply (V-cycle)
  - a full pcg.solve at production settings (reports iteration count)
  - the local prox step
  - one full fused ADMM step (solver.run)

Usage: python benchmarks/global_lab.py [--nx 80 --ny 20 --nz 20]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fused_time(fn, x0, n=100, reps=3):
    """Best-of-reps of an n-fold composed apply (lax.scan), per-call us."""
    import jax

    @jax.jit
    def loop(x):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out

    out = loop(x0)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = loop(x0)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / n, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=80)
    ap.add_argument("--ny", type=int, default=20)
    ap.add_argument("--nz", type=int, default=20)
    ap.add_argument("--scramble", action="store_true",
                    help="randomly permute vertex ids (locality stress)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # Handshake first: the tunnel intermittently wedges a fresh client at
    # its first device contact (memory: tpu-tunnel-serialization). Doing a
    # trivial op up front and printing lets the tpu_run.sh watchdog use a
    # short stall window instead of waiting out a long legit compile.
    jnp.asarray([1.0]).block_until_ready()
    print(f"handshake ok: {jax.devices()}", flush=True)

    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.geometry.factory import make_tet_blocks
    from admm_elastic_tpu.solvers import pcg as pcg_mod
    from admm_elastic_tpu.system import system as sysm

    mesh = make_tet_blocks(args.nx, args.ny, args.nz)
    if args.scramble:
        rng = np.random.default_rng(0)
        perm = rng.permutation(len(mesh.vertices))
        iperm = np.empty_like(perm)
        iperm[perm] = np.arange(len(perm))
        mesh.vertices = mesh.vertices[perm]
        mesh.tets = iperm[mesh.tets]
    mesh.flags = binding.NOSELFCOLLISION | binding.NEOHOOKEAN
    solver = Solver()
    binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
    pins = [int(i) for i in np.where(mesh.vertices[:, 0] < 1e-9)[0]]
    solver.set_pins(pins)
    st = Settings(verbose=0, admm_iters=10, linsolver=3, dtype=np.float32,
                  pcg_precond="twogrid", pcg_max_iters=60, pcg_tol=1e-6)
    t0 = time.perf_counter()
    assert solver.initialize(st)
    print(f"init {time.perf_counter()-t0:.1f}s  n_verts={solver._n_verts} "
          f"n_tets={len(mesh.tets)}", flush=True)

    data = solver._solve_data
    n = solver._n_verts
    x = jnp.asarray(np.random.default_rng(1).standard_normal((n, 3)),
                    jnp.float32)

    t, _ = fused_time(lambda v: data.apply(v), x)
    nnzb = (int(np.asarray(data.ell_vals).size) * 8 + n * 3 * 4 * 2
            + n * 4 * 3)
    print(f"ELL apply:        {t*1e6:8.1f} us  "
          f"(~{nnzb/1e6:.1f} MB -> {nnzb/t/1e9:.0f} GB/s)", flush=True)

    pre = data.precondition()
    t, _ = fused_time(pre, x)
    print(f"twogrid V-cycle:  {t*1e6:8.1f} us", flush=True)

    inv_d = (1.0 / data.diag())[:, None]
    t, _ = fused_time(lambda v: inv_d * v, x)
    print(f"jacobi only:      {t*1e6:8.1f} us", flush=True)

    # Full production solve (b from a realistic state).
    st0 = solver.state
    b = jnp.asarray(
        np.random.default_rng(2).standard_normal((n, 3)), jnp.float32) * 1e-3

    @jax.jit
    def solve(b_, x0_):
        return pcg_mod.solve(data.apply, data.precondition(), b_, x0_,
                             1e-6, 60)

    xs, iters = solve(b, st0.x)
    jax.block_until_ready(xs)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        xs, iters = solve(b, st0.x)
        jax.block_until_ready(xs)
        best = min(best, time.perf_counter() - t0)
    print(f"pcg.solve:        {best*1e3:8.2f} ms  iters={int(iters)} "
          f"(incl. one dispatch)", flush=True)

    # Local step (prox) cost.
    z = sysm.zeros_like_Dx(solver.system, jnp.float32)
    u = [jnp.zeros_like(zi) for zi in z]

    @jax.jit
    def local(x_, z_, u_):
        return sysm.local_step(solver.system, x_, z_, u_, n_newton_iters=8)

    zz, uu = local(st0.x, z, u)
    jax.block_until_ready(zz[0])
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        zz, uu = local(st0.x, z, u)
        jax.block_until_ready(zz[0])
        best = min(best, time.perf_counter() - t0)
    print(f"local step:       {best*1e3:8.2f} ms (incl. one dispatch)",
          flush=True)

    # Whole fused rollout, calibrated like matrix.py.
    solver.run(1)
    jax.block_until_ready(solver.state.x)
    steps = 3
    t0 = time.perf_counter()
    solver.run(steps)
    jax.block_until_ready(solver.state.x)
    t = time.perf_counter() - t0
    while t < 2.0 and steps < 200:
        steps = min(200, max(steps + 1, int(steps * 2.0 / max(t, 1e-3))))
        t0 = time.perf_counter()
        solver.run(steps)
        jax.block_until_ready(solver.state.x)
        t = time.perf_counter() - t0
    for _ in range(2):
        t0 = time.perf_counter()
        solver.run(steps)
        jax.block_until_ready(solver.state.x)
        t = min(t, time.perf_counter() - t0)
    print(f"full step:        {t/steps*1e3:8.2f} ms/step "
          f"({10*steps/t:.1f} ADMM iters/s, {steps}-step rollout)",
          flush=True)


if __name__ == "__main__":
    main()
