"""Torus divergence drill-down: single ops and per-step error growth.

torus_bisect: stencil+ELL passes (1.7e-5), gather+circular passes
(3.2e-5), stencil+circular fails (4.0e-3) — an interaction. Distinguish
chaotic amplification (per-step error grows smoothly from backend
roundoff) from a TPU fusion miscompile (a single step or op already
diverges) by comparing, TPU vs CPU child:

  - one Dx / DtW2 / banded-apply on identical inputs (op-level),
  - per-step trajectory error over 8 steps (step-level).

Usage: bash benchmarks/tpu_run.sh /tmp/torus_bisect2.log 3600 300 \
    python -u benchmarks/torus_bisect2.py
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)


def build():
    import jax.numpy as jnp
    import numpy as np

    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.geometry.factory import make_tet_torus
    from admm_elastic_tpu.ops import prox as prox_ops

    prox_ops.set_svd_impl("jacobi")
    mesh = make_tet_torus(n_ring=12, n_sec=4)
    mesh.flags = binding.NOSELFCOLLISION | binding.NEOHOOKEAN
    s = Solver()
    binding.add_tetmesh(s, mesh, Lame.soft_rubber(), verbose=False)
    s.set_pins(list(range(25)))
    st = Settings(verbose=0, admm_iters=10, linsolver=3,
                  gravity=-9.8, dtype=np.float32, direct_mode="inv")
    assert s.initialize(st)
    return s


def compute():
    import jax.numpy as jnp

    from admm_elastic_tpu.system import system as sysm

    s = build()
    n = s._n_verts
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    out = {}
    rows = sysm.Dx(s.system, x)
    out["dx0"] = np.asarray(rows[0], np.float64)
    w2 = [jnp.ones_like(r) for r in rows]
    out["dt"] = np.asarray(sysm.DtW2(s.system, rows), np.float64)
    out["apply"] = np.asarray(s._solve_data.apply(x), np.float64)
    out["apply_T"] = np.asarray(s._solve_data.apply_T(x.T).T, np.float64)
    traj = []
    for _ in range(8):
        s.step()
        traj.append(np.asarray(s.x, np.float64))
    out["traj"] = np.stack(traj)
    return out


def main():
    if os.environ.get("TB2_CHILD"):
        import jax

        jax.config.update("jax_platforms", "cpu")
        np.savez(os.environ["TB2_OUT"], **compute())
        return

    import jax
    import jax.numpy as jnp

    jnp.asarray([1.0]).block_until_ready()
    print(f"handshake ok: {jax.devices()}", flush=True)
    tpu = compute()
    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        env = dict(os.environ, TB2_CHILD="1", TB2_OUT=f.name,
                   JAX_PLATFORMS="cpu")
        subprocess.run([sys.executable, os.path.abspath(__file__)],
                       check=True, env=env, timeout=900)
        cpu = dict(np.load(f.name))
    for k in ("dx0", "dt", "apply", "apply_T"):
        sc = max(np.abs(cpu[k]).max(), 1e-30)
        print(json.dumps({"op": k,
                          "rel_err": float(np.abs(tpu[k] - cpu[k]).max() / sc)}),
              flush=True)
    for i in range(8):
        sc = np.abs(cpu["traj"][i]).max()
        print(json.dumps({"step": i,
                          "rel_err": float(np.abs(tpu["traj"][i] - cpu["traj"][i]).max() / sc)}),
              flush=True)


if __name__ == "__main__":
    main()
