"""Uzawa saddle-point solver: CG on the contact Schur complement.

TPU re-design of the reference UzawaCG (src/UzawaCG.hpp:32-125):

    [ A  C^T ] [x]   [b]
    [ C  0   ] [y] = [c]

CG runs on  S = C A^-1 C^T  without forming it — each iteration is
C^T apply (masked scatter), one prefactored A^-1 apply (two batched
triangular solves), and C apply (masked gather). Constraint rows live in
fixed-capacity masked buffers (collision/constraints.py) so the iteration
count and shapes are static under jit; inactive rows have zero C rows and
therefore never influence the Krylov space.

Multiplier warm-starting across solves matches the reference: y is kept
when the active-constraint count is unchanged, reset otherwise
(src/UzawaCG.hpp:68-74).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from admm_elastic_tpu.collision import constraints as con


def solve(apply_Ainv, hits: con.Hits, ck, b0, x_guess, y, max_iters, tol):
    """Returns (x, y, iters).

    apply_Ainv: [N,3] -> [N,3] prefactored solve.
    hits: deduped fixed-capacity constraint buffers.
    y: [2H] warm-start multipliers (passive rows then dynamic rows).
    """
    del x_guess  # direct solve; no warm start needed (parity w/ reference)
    n = b0.shape[0]
    dtype = b0.dtype
    h = hits.capacity

    def C(x):
        rp, rd = con.C_apply(hits, ck, x)
        return jnp.concatenate([rp, rd])

    def Ct(yv):
        return con.Ct_apply(hits, ck, yv[:h], yv[h:], n)

    cp, cd = con.C_rhs(hits, ck)
    c = jnp.concatenate([cp, cd])

    # NOTE: no lax.cond fast path for the zero-constraint case. This
    # environment's XLA:TPU build miscompiles cond(pred, <branch with
    # while_loop>, ...) when fused with the upstream detection program —
    # the TRUE branch is skipped even with a verifiably true predicate
    # (n_active()==15 returned from the same program). The constrained
    # path degenerates correctly anyway when nothing is active: all C
    # rows are masked to zero, so r0 = 0 and the CG while_loop exits
    # after one iteration with x = A^-1 b, matching the reference's fast
    # path (src/UzawaCG.hpp:76-81) at the cost of one masked gather.
    def constrained(_):
        x0 = apply_Ainv(b0 - Ct(y))
        r0 = C(x0) - c
        # Mask inactive rows out of the residual (their C row is 0 but c
        # could be stale-free anyway; keep it clean).
        active = jnp.concatenate([hits.p_mask, hits.d_mask])
        r0 = jnp.where(active, r0, 0.0)
        d0 = r0
        tiny = jnp.finfo(dtype).tiny
        # Clamp to the dtype's achievable relative residual: the reference
        # default tol=1e-10 is below f32 machine precision, which would
        # force max_iters every solve (in f64 the clamp is a no-op).
        tol_c = jnp.maximum(jnp.asarray(tol, dtype), 64 * jnp.finfo(dtype).eps)
        tol2 = tol_c * tol_c

        def cond(carry):
            _, _, r, d, k, done = carry
            return (~done) & (k < max_iters)

        def body(carry):
            x, yv, r, d, k, _ = carry
            q2 = apply_Ainv(Ct(d))
            q3 = jnp.where(active, C(q2), 0.0)
            denom = jnp.dot(d, q3)
            bad = jnp.abs(denom) < tiny
            alpha = jnp.where(bad, 0.0, jnp.dot(d, r) / jnp.where(bad, 1.0, denom))
            x = x - alpha * q2
            yv = yv + alpha * d
            r = r - alpha * q3
            small = jnp.dot(r, r) < tol2
            beta = jnp.where(bad, 0.0, jnp.dot(r, q3) / jnp.where(bad, 1.0, denom))
            d = r - beta * d
            done = bad | small
            return (x, yv, r, d, k + 1, done)

        init = (x0, y, r0, d0, jnp.asarray(0, jnp.int32), jnp.asarray(False))
        x, yv, _, _, iters, _ = jax.lax.while_loop(cond, body, init)
        return x, yv, jnp.maximum(iters, 1)

    return constrained(None)
