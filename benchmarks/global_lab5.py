"""Why does the composed ADMM body cost 5x the sum of its parts?

global_lab4 (r3, 160k tets): in the production fused rollout the rhs
costs ~4.7 ms (isolated: 1.23) and the Pallas prox ~3.9 ms (isolated:
0.69). The composition suspects are the loop-carried [9, T] z/u buffers
(layout changes / copies around the Pallas custom-call and the stencil
fusions) and the loop context itself. This lab rebuilds the admm body
from the real pieces under a lax.scan and toggles one suspect at a time:

  L0  local+rhs+cg, z/u carried [9, T]        (reproduce production)
  L1  same, z/u carried FLAT [9*T]            (layout-neutral carry)
  L2  same as L0 without CG                   (x = tiny*b + x)
  L3  local+rhs, z/u NOT carried (fresh 0s)   (no big carries at all)
  L4  L0 with jnp (non-Pallas) prox           (custom-call boundary?)

Usage: bash benchmarks/tpu_run.sh /tmp/lab5.log 3600 200 \
    python -u benchmarks/global_lab5.py
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from global_lab3 import slope  # noqa: E402


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
    from admm_elastic_tpu.ops import pallas_kernels
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
    print(f"init {time.perf_counter()-t0:.0f}s", flush=True)

    system = solver.system
    data = solver._solve_data
    n = solver._n_verts
    precond = data.precondition()

    rng = np.random.default_rng(0)
    x_base = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    M_xbar = system.masses[:, None] * x_base
    z_shapes = [tuple(z.shape) for z in sysm.zeros_like_Dx(system, jnp.float32)]

    def admm_body(x, z, u, use_cg=True):
        z, u = sysm.local_step(system, x, z, u, 8)
        b = sysm.rhs(system, M_xbar, z, u)
        if use_cg:
            x, _ = pcg_mod.solve(data.apply, precond, b, x, 1e-6, 60)
        else:
            x = x + np.float32(1e-20) * b
        return x, z, u

    def make_variant(carry_mode, use_cg=True):
        def make(nlen):
            @jax.jit
            def loop(seed):
                x0 = x_base * seed
                z0 = [jnp.zeros(s, jnp.float32) for s in z_shapes]
                u0 = [jnp.zeros(s, jnp.float32) for s in z_shapes]

                if carry_mode == "rows":
                    def f(c, _):
                        x, z, u = c
                        x, z, u = admm_body(x, z, u, use_cg)
                        return (x, z, u), None
                    (x, _, _), _ = jax.lax.scan(
                        f, (x0, z0, u0), None, length=nlen)
                elif carry_mode == "flat":
                    sizes = [int(np.prod(s)) for s in z_shapes]

                    def unflat(vec):
                        out, o = [], 0
                        for s, sz in zip(z_shapes, sizes):
                            out.append(vec[o:o + sz].reshape(s))
                            o += sz
                        return out

                    def flat(lst):
                        return jnp.concatenate([a.reshape(-1) for a in lst])

                    def f(c, _):
                        x, zf, uf = c
                        x, z, u = admm_body(x, unflat(zf), unflat(uf), use_cg)
                        return (x, flat(z), flat(u)), None
                    (x, _, _), _ = jax.lax.scan(
                        f, (x0, flat(z0), flat(u0)), None, length=nlen)
                elif carry_mode == "none":
                    def f(c, _):
                        x = c
                        z = [jnp.zeros(s, jnp.float32) for s in z_shapes]
                        u = [jnp.zeros(s, jnp.float32) for s in z_shapes]
                        x, z, u = admm_body(x, z, u, use_cg)
                        # keep a data dependence on z/u so they are not DCE'd
                        x = x * (1.0 + np.float32(1e-20) * (jnp.sum(z[0])
                                                            + jnp.sum(u[0])))
                        return x, None
                    x, _ = jax.lax.scan(f, x0, None, length=nlen)
                else:
                    raise ValueError(carry_mode)
                return x
            return loop
        return make

    def report(name, t):
        print(f"{name:34s} {t*1e3:8.2f} ms/iter", flush=True)

    report("L0 rows carry (production-like)",
           slope(make_variant("rows"), n_lo=4, n_hi=16))
    report("L1 flat carry",
           slope(make_variant("flat"), n_lo=4, n_hi=16))
    report("L2 rows carry, no CG",
           slope(make_variant("rows", use_cg=False), n_lo=4, n_hi=16))
    report("L3 no big carry (fresh z/u)",
           slope(make_variant("none"), n_lo=4, n_hi=16))

    pallas_kernels.set_pallas_mode("off")
    try:
        report("L4 rows carry, jnp prox",
               slope(make_variant("rows"), n_lo=4, n_hi=16))
    finally:
        pallas_kernels.set_pallas_mode("auto")


if __name__ == "__main__":
    main()
