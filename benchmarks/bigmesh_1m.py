"""One-million-tet beam: the scale tier past the 512k north-star.

Ours: 125x40x40 make_tet_blocks lattice (1,000,000 tets / 211,806
verts), NH, pinned -x face, ls=3 banded-PCG (jacobi, 150, 1e-6) — the
exact beam-nh-500k matrix recipe one size up. Timing follows
benchmarks/matrix.py::_time (calibrated fused rollouts, best-of-5).

Reference denominator (run separately, CPU):
  /tmp/ref_build/ref_driver 125 40 40 10 2 1
(the beam-nh grid's model-1 LDLT config at nx=125; build via
benchmarks/build_reference.sh). Combined record: BIGMESH_1M_r5.json.

Usage: bash benchmarks/tpu_run.sh /tmp/bigmesh1m.log 3600 600 \
    python -u benchmarks/bigmesh_1m.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matrix import _beam_solver, _time, ADMM_ITERS  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jnp.asarray([1.0]).block_until_ready()
    print(f"handshake ok: {jax.devices()}", flush=True)

    t0 = time.perf_counter()
    solver = _beam_solver(125, 40, 40, "nh", 3, pcg=("jacobi", 150, 1e-6))
    print(f"init {time.perf_counter()-t0:.0f}s "
          f"(V={solver._n_verts})", flush=True)
    dt = _time(solver, steps=3)
    row = {"label": "beam-nh-1m", "n_verts": int(solver._n_verts),
           "n_tets": 1000000, "ms_per_step": round(dt * 1e3, 2),
           "admm_iters_per_s": round(ADMM_ITERS / dt, 1)}
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
