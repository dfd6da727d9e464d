"""Is the bunny 1-step crossval gap (5.96e-4 > the 1e-4 beam-class
bound) a TPU miscompile or a legit reassociation floor?

Protocol = torus_bisect2 (r3): compare the INDIVIDUAL hot ops of the
bunny scene's step on identical inputs across backends. If every op is
bit-identical (or ~1e-7 f32 noise) while the fused 1-step trajectory
wanders 6e-4, the gap is op-ORDERING sensitivity of the scene (legit
floor -> scene-specific bound, the torus precedent); any op with a real
per-op divergence is a miscompile lead.

Ops checked on the bunny operator (irregular mesh -> gather D/Dt +
RCM-banded DIA A): Dx gather, Dt W^2 reduction, banded apply_T, Jacobi
PCG solve at fixed iteration count, and the fused NH prox kernel.

Usage: bash benchmarks/tpu_run.sh /tmp/bunny_bisect.log 2400 600 \
    python -u benchmarks/bunny_bisect.py
"""

import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/reference/samples/data/bunny_1124"


def build():
    import jax.numpy as jnp

    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.geometry.io import load_elenode
    from admm_elastic_tpu.ops import prox as prox_ops

    prox_ops.set_svd_impl("jacobi")
    mesh = load_elenode(BASE)
    mesh.flags = binding.NOSELFCOLLISION | binding.NEOHOOKEAN
    solver = Solver()
    binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
    ylo = mesh.vertices[:, 1].min()
    solver.set_pins(
        [int(i) for i in np.where(mesh.vertices[:, 1] < ylo + 0.015)[0]])
    st = Settings(verbose=0, admm_iters=10, linsolver=3,
                  gravity=-9.8, dtype=np.float32, direct_mode="inv")
    assert solver.initialize(st)
    return solver


def compute():
    import jax
    import jax.numpy as jnp

    from admm_elastic_tpu.solvers import pcg as pcg_mod
    from admm_elastic_tpu.system import system as sysm

    solver = build()
    data = solver._solve_data
    sys_ = solver.system
    n = solver._n_verts
    rng = np.random.default_rng(7)
    xT = jnp.asarray(rng.standard_normal((3, n)), jnp.float32)
    x = xT.T

    out = {}
    out["apply_T"] = np.asarray(jax.jit(data.apply_T)(xT))
    out["A_mv"] = np.asarray(jax.jit(lambda v: sysm.A_mv(sys_, v))(x))
    bT = jnp.asarray(rng.standard_normal((3, n)), jnp.float32)
    precond_T = data.precondition_T()

    def pcg_fixed(b_T):
        x_, _ = pcg_mod.solve_T(data.apply_T, precond_T, b_T.T,
                                jnp.zeros_like(b_T.T), 1e-30, 60)
        return x_

    out["pcg60"] = np.asarray(jax.jit(pcg_fixed)(bT))
    # The fused production step (the quantity crossval compares).
    solver.run(1)
    out["step1"] = np.asarray(solver.state.x)
    return out


def main():
    if os.environ.get("BISECT_CHILD"):
        import jax

        jax.config.update("jax_platforms", "cpu")
        out = compute()
        np.savez(os.environ["BISECT_OUT"], **{k: v for k, v in out.items()
                                               if v is not None})
        return
    import jax
    import jax.numpy as jnp

    jnp.asarray([1.0]).block_until_ready()
    print(f"handshake ok: {jax.devices()}", flush=True)

    env = dict(os.environ, BISECT_CHILD="1", BISECT_OUT="/tmp/bunny_cpu.npz")
    subprocess.run([sys.executable, os.path.abspath(__file__)], check=True,
                   env=env, timeout=900)
    cpu = np.load("/tmp/bunny_cpu.npz")
    acc = compute()
    for k in cpu.files:
        a, c = np.asarray(acc[k], np.float64), cpu[k].astype(np.float64)
        scale = max(np.abs(c).max(), 1e-30)
        rec = {"op": k, "rel_err": float(f"{np.abs(a - c).max() / scale:.3e}"),
               "bitwise": bool(np.array_equal(a, c))}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
