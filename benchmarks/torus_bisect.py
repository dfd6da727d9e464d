"""Bisect the torus_nh_pcg crossval divergence (4e-3 TPU-vs-CPU).

The scene passed at 2.2e-5 before {padding cut, circular bands,
wrap-concat stencil, solve_T}; this script re-runs it on both backends
with each suspect toggled off:

  V0 current code
  V1 spmv_format="ell"      (no bands at all -> no circular apply)
  V2 solve_T -> solve shim  ([N,3] CG loop, same operators)
  V3 ADMM_TPU_NO_STENCIL=1  (gather D/D^T, unpadded batch)

Usage: bash benchmarks/tpu_run.sh /tmp/torus_bisect.log 3600 300 \
    python -u benchmarks/torus_bisect.py
"""

import functools
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)

VARIANTS = ["V0", "V1", "V2", "V3"]


def apply_variant(v):
    # V2's traces have identical shapes to V0 — stale jit cache entries
    # would silently serve the previous variant's code.
    from admm_elastic_tpu import solver as solver_mod

    solver_mod._run_impl.clear_cache()
    solver_mod._step_impl.clear_cache()
    if v == "V3":
        os.environ["ADMM_TPU_NO_STENCIL"] = "1"
        return
    os.environ.pop("ADMM_TPU_NO_STENCIL", None)
    from admm_elastic_tpu.solvers import pcg as pcg_mod

    if not hasattr(pcg_mod, "_orig_prepare"):
        pcg_mod._orig_prepare = pcg_mod.prepare
        pcg_mod._orig_solve_T = pcg_mod.solve_T
    pcg_mod.prepare = pcg_mod._orig_prepare
    pcg_mod.solve_T = pcg_mod._orig_solve_T
    if v == "V1":
        pcg_mod.prepare = functools.partial(pcg_mod._orig_prepare,
                                            spmv_format="ell")
    elif v == "V2":
        def shim(A_T, M_T, b, x0, tol, it):
            return pcg_mod.solve(lambda x: A_T(x.T).T,
                                 lambda r: M_T(r.T).T, b, x0, tol, it)
        pcg_mod.solve_T = shim


def run_torus(v):
    apply_variant(v)
    from crossval import run_scene

    return run_scene("torus", "neohookean", 3)


def main():
    child = os.environ.get("TORUS_BISECT_CHILD")
    if child:
        import jax

        jax.config.update("jax_platforms", "cpu")
        x = run_torus(child)
        np.save(os.environ["TORUS_BISECT_OUT"], x)
        return

    import jax
    import jax.numpy as jnp

    jnp.asarray([1.0]).block_until_ready()
    print(f"handshake ok: {jax.devices()}", flush=True)

    for v in VARIANTS:
        x_tpu = run_torus(v)
        with tempfile.NamedTemporaryFile(suffix=".npy") as f:
            env = dict(os.environ, TORUS_BISECT_CHILD=v,
                       TORUS_BISECT_OUT=f.name, JAX_PLATFORMS="cpu")
            env.pop("ADMM_TPU_NO_STENCIL", None)
            subprocess.run([sys.executable, os.path.abspath(__file__)],
                           check=True, env=env, timeout=900)
            x_cpu = np.load(f.name)
        scale = max(np.abs(x_cpu).max(), 1e-30)
        err = float(np.abs(x_tpu - x_cpu).max() / scale)
        print(json.dumps({"variant": v, "rel_err": err}), flush=True)


if __name__ == "__main__":
    main()
