"""Host-side (numpy) assembly of the single-component global matrix.

Computed once at initialize (topology and dt are static), mirroring the
reference's one-time sparse assembly + factorization
(src/Solver.cpp:199-246). Because each element block of A is K ⊗ I3, we
assemble the N x N single-component matrix A_hat:

    A_hat[i, j] = m_i δij + dt^2 Σ_elements w^2 (Dlocal Dlocal^T)[a, b]

Products:
- dense A_hat -> Cholesky prefactor for the direct solver,
- padded ELL (cols [N,K], vals [N,K], diag [N]) -> Gauss-Seidel / fast SpMV,
- greedy multicolor ordering of the vertex graph -> parallel GS sweeps
  (replaces mcl::graphcolor::color_matrix, used at
  src/NodalMultiColorGS.hpp:57).

A native C++ path (admm_elastic_tpu.native) accelerates adjacency and
coloring for large meshes; this numpy path is the always-available
fallback and the correctness oracle.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def _coo_entries(system) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """COO (rows, cols, vals) of dt^2 * D^T W^2 D in single-component form."""
    rows, cols, vals = [], [], []
    dt2 = system.dt * system.dt
    for b in list(system.tets) + list(system.tris):
        inds = np.asarray(b.inds)  # [T, k]
        Dl = np.asarray(b.Dlocal, dtype=np.float64)  # [T, k, c]
        w2 = np.asarray(b.weight, dtype=np.float64) ** 2  # [T]
        K = np.einsum("tac,tbc->tab", Dl, Dl) * (dt2 * w2)[:, None, None]  # [T,k,k]
        k = inds.shape[1]
        rows.append(np.repeat(inds, k, axis=1).reshape(-1))
        cols.append(np.tile(inds, (1, k)).reshape(-1))
        vals.append(K.reshape(-1))
    if system.pins is not None:
        idx = np.asarray(system.pins.idx)
        w2 = np.asarray(system.pins.weight, dtype=np.float64) ** 2
        rows.append(idx)
        cols.append(idx)
        vals.append(dt2 * w2)
    if not rows:
        z = np.zeros((0,), dtype=np.int64)
        return z, z, np.zeros((0,), dtype=np.float64)
    r = np.concatenate(rows).astype(np.int64)
    c = np.concatenate(cols).astype(np.int64)
    v = np.concatenate(vals)
    # Exact zeros carry no coupling. Dead (padded) lanes of flat-stencil
    # families (ops/stencil.py) have weight 0 and spread inds; dropping
    # their zero entries keeps the ELL width, the vertex adjacency (GS
    # coloring, two-grid aggregation), and the band plan free of
    # artificial fill.
    keep = v != 0.0
    return r[keep], c[keep], v[keep]


def assemble_dense(system) -> np.ndarray:
    """Dense single-component A_hat [N, N] (f64), for the direct solver."""
    n = system.n_verts
    A = np.zeros((n, n), dtype=np.float64)
    rows, cols, vals = _coo_entries(system)
    np.add.at(A, (rows, cols), vals)
    A[np.arange(n), np.arange(n)] += np.asarray(system.masses, dtype=np.float64)
    return A


def _dedup_coo(rows, cols, vals, n):
    key = rows * n + cols
    order = np.argsort(key, kind="stable")
    key, rows, cols, vals = key[order], rows[order], cols[order], vals[order]
    uniq, start = np.unique(key, return_index=True)
    sums = np.add.reduceat(vals, start) if len(vals) else vals
    return rows[start], cols[start], sums


def assemble_ell(system, dtype=np.float64):
    """Padded ELL of A_hat: (cols i32 [N,K], vals [N,K], diag [N]).

    Off-diagonal entries only; padding columns point at row 0 with value 0
    (safe gather). diag includes masses.
    """
    n = system.n_verts
    rows, cols, vals = _coo_entries(system)
    rows, cols, vals = _dedup_coo(rows, cols, vals, n)
    diag = np.zeros((n,), dtype=np.float64)
    on_diag = rows == cols
    diag[rows[on_diag]] += vals[on_diag]
    diag += np.asarray(system.masses, dtype=np.float64)

    rows, cols, vals = rows[~on_diag], cols[~on_diag], vals[~on_diag]
    counts = np.bincount(rows, minlength=n)
    K = int(counts.max()) if len(counts) and counts.max() > 0 else 1
    ell_cols = np.zeros((n, K), dtype=np.int32)
    ell_vals = np.zeros((n, K), dtype=np.float64)
    order = np.argsort(rows, kind="stable")
    rows, cols, vals = rows[order], cols[order], vals[order]
    # Position of each entry within its row.
    slot = np.arange(len(rows)) - np.concatenate(([0], np.cumsum(counts)))[rows]
    ell_cols[rows, slot] = cols
    ell_vals[rows, slot] = vals
    return ell_cols, ell_vals.astype(dtype), diag.astype(dtype)


def greedy_aggregates(adj: List[np.ndarray], target_size: int = 24) -> np.ndarray:
    """Greedy BFS aggregation of the vertex graph into ~target_size clusters.

    Host-side, one-time (topology is static). Returns agg i32 [N] cluster
    ids, contiguous 0..C-1. Used to build the coarse level of the two-grid
    PCG preconditioner (solvers/pcg.py): piecewise-constant prolongation
    keeps both transfer operators as a single gather / segment-sum.
    """
    try:
        from admm_elastic_tpu.native import greedy_aggregates_native

        return greedy_aggregates_native(adj, target_size)
    except Exception:
        pass
    n = len(adj)
    agg = -np.ones(n, dtype=np.int64)
    c = 0
    for v in range(n):
        if agg[v] >= 0:
            continue
        agg[v] = c
        members = 1
        frontier = [v]
        while frontier and members < target_size:
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if agg[w] < 0 and members < target_size:
                        agg[w] = c
                        members += 1
                        nxt.append(w)
            frontier = nxt
        c += 1
    return agg.astype(np.int32)


def coarse_matrix(system, agg: np.ndarray) -> np.ndarray:
    """Galerkin coarse operator A_c = P^T A P for piecewise-constant P.

    A_c[a,b] = sum over fine entries (i,j) with agg[i]=a, agg[j]=b; the
    mass diagonal aggregates likewise. Host f64 dense [C, C].
    """
    n = system.n_verts
    rows, cols, vals = _coo_entries(system)
    rows, cols, vals = _dedup_coo(rows, cols, vals, n)
    c = int(agg.max()) + 1
    A_c = np.zeros((c, c), dtype=np.float64)
    np.add.at(A_c, (agg[rows], agg[cols]), vals)
    masses = np.asarray(system.masses, dtype=np.float64)
    np.add.at(A_c, (np.arange(c), np.arange(c)),
              np.bincount(agg, weights=masses, minlength=c))
    return A_c


def vertex_adjacency(system) -> List[np.ndarray]:
    """Adjacency lists of the vertex graph (vertices sharing an element)."""
    n = system.n_verts
    rows, cols, _ = _coo_entries(system)
    off = rows != cols
    rows, cols = rows[off], cols[off]
    key = rows * n + cols
    key = np.unique(key)
    rows, cols = key // n, key % n
    counts = np.bincount(rows, minlength=n)
    starts = np.concatenate(([0], np.cumsum(counts)))
    return [cols[starts[i]:starts[i + 1]] for i in range(n)]


def greedy_coloring(adj: List[np.ndarray]) -> np.ndarray:
    """Greedy graph coloring; returns color id per vertex.

    Tries the native C++ implementation first (admm_elastic_tpu.native),
    falls back to pure Python.
    """
    try:
        from admm_elastic_tpu.native import greedy_coloring_native

        return greedy_coloring_native(adj)
    except Exception:
        pass
    n = len(adj)
    colors = np.full((n,), -1, dtype=np.int32)
    for v in range(n):
        used = set(colors[u] for u in adj[v] if colors[u] >= 0)
        c = 0
        while c in used:
            c += 1
        colors[v] = c
    return colors


def color_groups(colors: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Pad per-color vertex lists to a [C, Lmax] i32 array + bool mask.

    Padding uses index N (out of range) so masked scatter with mode='drop'
    is a no-op.
    """
    n = len(colors)
    n_colors = int(colors.max()) + 1 if n else 0
    groups = [np.where(colors == c)[0] for c in range(n_colors)]
    lmax = max(len(g) for g in groups)
    out = np.full((n_colors, lmax), n, dtype=np.int32)
    mask = np.zeros((n_colors, lmax), dtype=bool)
    for c, g in enumerate(groups):
        out[c, : len(g)] = g
        mask[c, : len(g)] = True
    return out, mask
