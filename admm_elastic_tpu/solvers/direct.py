"""Prefactored direct solver (the reference's LDLTSolver, src/LinearSolver.hpp:59-92).

TPU-native design: A is component-decoupled, so we factor the N x N
single-component matrix once at initialize (host, f64) and per ADMM
iteration do two triangular solves with the 3 coordinates as batched RHS.
Optionally ("inv" mode) the explicit inverse is precomputed so the
per-iteration solve is a single [N,N] @ [N,3] matmul on the MXU — the
fastest option on TPU for medium N; "cho" keeps triangular solves for
maximum accuracy.

Like the reference, this solver cannot handle collision constraints
(Solver::initialize throws if obstacles are present with linsolver=0,
src/Solver.cpp:249-254).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DirectData:
    mat: jax.Array  # [N, N]: Cholesky factor L ("cho") or (SAS)^-1 ("inv")
    scale: jax.Array  # [N, 1] Jacobi equilibration s = diag(A)^(-1/2) ("inv")
    mode: str  # "cho" | "inv"


jax.tree_util.register_dataclass(
    DirectData, data_fields=("mat", "scale"), meta_fields=("mode",)
)


def prepare(A_dense: np.ndarray, dtype, mode: str = "cho") -> DirectData:
    """One-time factorization (host, always f64 for stability).

    "inv" stores the inverse of the *Jacobi-equilibrated* matrix B = S A S,
    S = diag(A)^(-1/2), applied as x = S (B^-1 (S b)). Equilibration drops
    the stored matrix's condition number by the diagonal spread (pins put
    ~dt^2 w_pin^2 on their diagonal entries, ~1e5 x the rest), which is
    exactly the f32 cancellation error an un-scaled A^-1 matmul suffers.
    """
    if mode == "inv":
        d = np.sqrt(np.diag(A_dense))
        s = 1.0 / d
        B = A_dense * s[:, None] * s[None, :]
        Binv = np.linalg.inv(B)
        return DirectData(
            mat=jnp.asarray(Binv, dtype=dtype),
            scale=jnp.asarray(s[:, None], dtype=dtype),
            mode="inv",
        )
    L = np.linalg.cholesky(A_dense)
    return DirectData(
        mat=jnp.asarray(L, dtype=dtype),
        scale=jnp.ones((L.shape[0], 1), dtype=dtype),
        mode="cho",
    )


def solve(data: DirectData, b):
    """x = A^-1 b for b [N, k] (k=3 coordinates as batched RHS)."""
    if data.mode == "inv":
        return data.scale * (data.mat @ (data.scale * b))
    y = jax.scipy.linalg.solve_triangular(data.mat, b, lower=True)
    return jax.scipy.linalg.solve_triangular(data.mat.T, y, lower=False)
