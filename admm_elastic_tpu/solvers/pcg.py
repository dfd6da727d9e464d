"""Matrix-free Jacobi-preconditioned conjugate gradient (TPU extension, ls=3).

The scalable replacement for the prefactored direct solver when N x N dense
is no longer reasonable: each iteration is one matrix-free A apply (gathers
+ batched contraction + segment scatter, see system.A_mv) plus a few
axpys/dots. Because A acts identically on the three coordinates, the whole
[N, 3] state is treated as a single Krylov vector. Dot products reduce over
all entries, so under sharding they lower to psum over the mesh axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve(A_mv, diag, b, x0, tol, max_iters):
    """Solve A x = b with Jacobi PCG.

    Args:
      A_mv: callable [N,3] -> [N,3].
      diag: [N] Jacobi preconditioner (single component).
      b, x0: [N, 3].
      tol: relative residual tolerance (on ||r||/||b||).
      max_iters: traced or static int bound.
    Returns (x, iters).
    """
    inv_d = (1.0 / diag)[:, None]

    def dot(a, b_):
        return jnp.sum(a * b_)

    b_norm2 = dot(b, b)
    tol2 = tol * tol * jnp.maximum(b_norm2, jnp.finfo(b.dtype).tiny)

    r0 = b - A_mv(x0)
    z0 = inv_d * r0
    p0 = z0
    rz0 = dot(r0, z0)

    def cond(carry):
        _, r, _, _, k, done = carry
        return (~done) & (k < max_iters)

    def body(carry):
        (x, r, p, rz, k, _) = carry
        Ap = A_mv(p)
        denom = dot(p, Ap)
        alpha = rz / jnp.where(jnp.abs(denom) < jnp.finfo(b.dtype).tiny, 1.0, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        z = inv_d * r
        rz_new = dot(r, z)
        beta = rz_new / jnp.where(jnp.abs(rz) < jnp.finfo(b.dtype).tiny, 1.0, rz)
        p = z + beta * p
        done = dot(r, r) < tol2
        return (x, r, p, rz_new, k + 1, done)

    init = (x0, r0, p0, rz0, jnp.asarray(0, jnp.int32), dot(r0, r0) < tol2)
    x, _, _, _, iters, _ = jax.lax.while_loop(cond, body, init)
    return x, iters
