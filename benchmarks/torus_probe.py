"""Torus global-step probe: why 4.2 ms/iter at 160k tets (beam: ~1.0)?

Compares jacobi vs twogrid preconditioning on the torus-nh-160k scene
and reads the inner-CG iteration counters — the torus is pinned at one
cross-section ring, so its stiffness system is much floppier than the
face-pinned beam and plain Jacobi CG may be iteration-bound.

Usage: bash benchmarks/tpu_run.sh /tmp/torus_probe.log 3600 300 \
    python -u benchmarks/torus_probe.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matrix import _torus_solver, _time, ADMM_ITERS  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jnp.asarray([1.0]).block_until_ready()
    print(f"handshake ok: {jax.devices()}", flush=True)

    # Piece attribution (slope protocol) for the roll-based ring stencil.
    from global_lab3 import slope
    from admm_elastic_tpu.system import system as sysm

    solver = _torus_solver(128, 16)
    system = solver.system
    n = solver._n_verts
    rng = np.random.default_rng(0)
    x_base = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    tiny = np.float32(1e-20)

    def scan_of(body):
        def make(nlen):
            @jax.jit
            def loop(seed):
                def f(c, _):
                    return body(c), None
                out, _ = jax.lax.scan(f, x_base * seed, None, length=nlen)
                return out
            return loop
        return make

    def dx_body(x):
        rows = sysm.Dx(system, x)
        acc = sum(jnp.sum(r) for r in rows)
        return x * (np.float32(1.0) + tiny * acc)

    def rhs_body(x):
        rows = sysm.Dx(system, x)
        return sysm.rhs(system, system.masses[:, None] * x_base, rows,
                        [jnp.zeros_like(r) for r in rows]) * tiny + x

    z0 = sysm.zeros_like_Dx(system, jnp.float32)

    def local_body(x):
        z, u = sysm.local_step(system, x, z0,
                               [jnp.zeros_like(z) for z in z0], 8)
        acc = sum(jnp.sum(a) for a in z) + sum(jnp.sum(a) for a in u)
        return x * (np.float32(1.0) + tiny * acc)

    for name, body in (("ring-stencil Dx", dx_body),
                       ("Dx + rhs(DtW2)", rhs_body),
                       ("local (Dx+prox)", local_body)):
        t = slope(scan_of(body), n_lo=4, n_hi=16)
        print(f"{name:22s} {t*1e6:9.1f} us", flush=True)
    del solver, system

    for precond in ("jacobi", "twogrid"):
        solver = _torus_solver(128, 16, pcg=(precond, 120, 1e-6))
        solver.run(5)
        jax.block_until_ready(solver.state.x)
        inner = []
        for _ in range(3):
            solver.step()
            inner.append(int(solver.runtime_data().inner_iters))
        dt = _time(solver, steps=3)
        print(json.dumps({
            "precond": precond,
            "ms_per_step": round(dt * 1e3, 2),
            "admm_iters_per_s": round(ADMM_ITERS / dt, 1),
            "inner_per_solve": round(np.mean(inner) / ADMM_ITERS, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
