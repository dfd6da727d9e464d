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
    mat: jax.Array  # [N, N]: Cholesky factor L ("cho") or A^-1 ("inv")
    mode: str  # "cho" | "inv"


jax.tree_util.register_dataclass(DirectData, data_fields=("mat",), meta_fields=("mode",))


def prepare(A_dense: np.ndarray, dtype, mode: str = "cho") -> DirectData:
    """One-time factorization (host, always f64 for stability)."""
    L = np.linalg.cholesky(A_dense)
    return prepare_from_cholesky(L, dtype, mode)


def prepare_from_cholesky(L: np.ndarray, dtype, mode: str = "cho") -> DirectData:
    if mode == "inv":
        n = L.shape[0]
        # A^-1 = L^-T L^-1; solve L X = I then L^T Ainv = X.
        eye = np.eye(n)
        X = np.linalg.solve(L, eye)
        Ainv = np.linalg.solve(L.T, X)
        return DirectData(mat=jnp.asarray(Ainv, dtype=dtype), mode="inv")
    return DirectData(mat=jnp.asarray(L, dtype=dtype), mode="cho")


def solve(data: DirectData, b):
    """x = A^-1 b for b [N, k] (k=3 coordinates as batched RHS)."""
    if data.mode == "inv":
        return data.mat @ b
    y = jax.scipy.linalg.solve_triangular(data.mat, b, lower=True)
    return jax.scipy.linalg.solve_triangular(data.mat.T, y, lower=False)
