"""Bisect why the REAL 160k-tet ELL apply is ~140x slower than the
identical synthetic form (spmv_lab: 15 us; global_lab: 2095 us).

Times every variant as a fused 100-apply lax.scan in ONE process on BOTH
the real assembled arrays and a freshly generated synthetic copy with the
same shapes, so process/layout/data effects separate cleanly.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fused(fn, x0, n=100, reps=3):
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
        out = jax.block_until_ready(loop(x0))
        best = min(best, time.perf_counter() - t0)
    return best / n


def main():
    import jax
    import jax.numpy as jnp

    jnp.asarray([1.0]).block_until_ready()
    print(f"handshake ok: {jax.devices()}", flush=True)

    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.geometry.factory import make_tet_blocks

    mesh = make_tet_blocks(80, 20, 20)
    mesh.flags = binding.NOSELFCOLLISION | binding.NEOHOOKEAN
    solver = Solver()
    binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
    pins = [int(i) for i in np.where(mesh.vertices[:, 0] < 1e-9)[0]]
    solver.set_pins(pins)
    st = Settings(verbose=0, admm_iters=10, linsolver=3, dtype=np.float32,
                  pcg_precond="jacobi", pcg_max_iters=60, pcg_tol=1e-6)
    assert solver.initialize(st)
    data = solver._solve_data
    n = solver._n_verts
    cols_np = np.asarray(data.ell_cols)
    vals_np = np.asarray(data.ell_vals)
    k = cols_np.shape[1]
    span = np.abs(cols_np.astype(np.int64) - np.arange(n)[:, None])
    span = span[vals_np != 0]
    print(f"n={n} K={k} nnz={(vals_np != 0).sum()} "
          f"col span p50={np.percentile(span, 50):.0f} "
          f"p99={np.percentile(span, 99):.0f} max={span.max()}", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)

    def report(name, t):
        print(f"{name:28s} {t*1e6:9.1f} us", flush=True)

    # Real arrays, as held by the solver.
    cols_r, vals_r = data.ell_cols, data.ell_vals
    diag_r = data.diag()

    report("real v0 (solver arrays)", fused(
        lambda v: diag_r[:, None] * v
        + jnp.sum(vals_r[:, :, None] * v[cols_r], axis=1), x))

    # Same numbers, re-uploaded fresh from host.
    cols_f = jnp.asarray(cols_np)
    vals_f = jnp.asarray(vals_np)
    report("real v0 (fresh upload)", fused(
        lambda v: diag_r[:, None] * v
        + jnp.sum(vals_f[:, :, None] * v[cols_f], axis=1), x))

    # Per-coordinate gather (spmv_lab v1 form).
    report("real v1 per-coord", fused(
        lambda v: diag_r[:, None] * v + jnp.stack(
            [jnp.sum(vals_f * v[:, c][cols_f], axis=1) for c in range(3)],
            axis=1), x))

    # Synthetic arrays with the SAME shapes in the same process.
    cols_s = jnp.asarray(rng.integers(0, 500, (n, k)).astype(np.int32)
                         + np.arange(n, dtype=np.int32)[:, None]
                         - 250).clip(0, n - 1)
    vals_s = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    report("synthetic same-shape v0", fused(
        lambda v: diag_r[:, None] * v
        + jnp.sum(vals_s[:, :, None] * v[cols_s], axis=1), x))

    # Elementwise canaries: layout of the [N,3] carry.
    inv = 1.0 / diag_r
    report("jacobi [N,3] carry", fused(lambda v: inv[:, None] * v, x))
    xT = jnp.asarray(np.asarray(x).T.copy())
    report("jacobi [3,N] carry", fused(lambda v: inv[None, :] * v, xT))
    xf = jnp.asarray(np.asarray(x).reshape(-1).copy())
    inv3 = jnp.asarray(np.repeat(np.asarray(inv), 3))
    report("jacobi [3N] carry", fused(lambda v: inv3 * v, xf))

    # v0 with the [3,N] state layout (gather along lanes).
    report("real v0T [3,N] state", fused(
        lambda vT: diag_r[None, :] * vT
        + jnp.sum(vals_f[None] * vT[:, cols_f], axis=2), xT))


if __name__ == "__main__":
    main()
