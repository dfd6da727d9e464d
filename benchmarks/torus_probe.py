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
