"""Per-step FIXED cost of the fused rollout at flagship scale.

flagship_lab reads ~198 us/step of non-ADMM-iteration cost at the bench
geometry, but its estimate (t5/steps - 5*slope) still contains the flat
~33 ms readback divided by the step count. This lab removes both
contaminations at once: admm_iters=0 makes the step body = kick + x_bar
+ zeros + v-update only, and a slope over TWO step counts cancels the
readback. Also re-reads the full-step slope at it=10 vs it=0 as a
consistency check on flagship_lab's per-iter number.

Usage: bash benchmarks/tpu_run.sh /tmp/flagship_lab2.log 1800 300 \
    python -u benchmarks/flagship_lab2.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jnp.asarray([1.0]).block_until_ready()
    print(f"handshake ok: {jax.devices()}", flush=True)

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
    print("init done", flush=True)

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

    for it in (0, 1, 10):
        t400 = run_t(it, 400)
        t1200 = run_t(it, 1200)
        per_step = (t1200 - t400) / 800
        print(f"admm_iters={it:2d}: per-step {per_step*1e6:7.1f} us "
              f"(t400={t400:.3f}s t1200={t1200:.3f}s)", flush=True)


if __name__ == "__main__":
    main()
