"""Windowed gather/scatter plans for IRREGULAR-mesh D / D^T.

Lattice meshes get gather-free stencils (ops/stencil.py); every other
mesh pays XLA:TPU's ~3 GB/s arbitrary-index gather for x[inds] in D x
and the vertex table in D^T (DESIGN.md r3 measurement: locality does not
help the gather). But mesh gathers are not arbitrary: after sorting
elements by their minimum corner vertex, every tile of R consecutive
corner rows reads only a narrow vertex WINDOW [start, start + W). A
within-window gather can then be computed without any HBM gather:

    rows_tile = onehot(local_idx) @ x[start : start + W]     (MXU)

with the one-hot built on the fly in VMEM (never materialized to HBM)
and two-level decomposed (idx = a*W2 + b: select the W2-group by matmul,
the in-group row by a W2-way vector select) so the one-hot build costs
R*(W1 + W2) compares instead of R*W. The transpose (D^T's scatter-add)
uses the same windows with the matmul transposed and a sequential-grid
VMEM accumulator — TPU Pallas grids execute sequentially on a core, so
overlapping windows accumulate race-free.

This module is the HOST side: element ordering, tiling, window
placement, and the fallback decision (meshes whose sorted windows exceed
`max_window` keep the plain gather path). The device kernels live in
ops/pallas_window.py; benchmarks/gather_lab.py measures the variants.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class WindowPlan:
    """Tiling of one element family's corner rows into vertex windows.

    order:  i64 [T] element permutation (new -> old); elements are sorted
      by min corner so windows are narrow. Identity when already sorted.
    starts: i32 [n_tiles] window start vertex per tile (sublane-aligned).
    local:  i32 [n_tiles, rows_per_tile] window-relative vertex index per
      corner row (pad rows point at the window's first vertex with no
      effect because their coefficients are zero).
    w:      static window size; all local < w and starts + w <= n_pad.
    rows_per_tile, n_tiles, n_pad: static geometry (n_pad = n + w).
    """

    order: np.ndarray
    starts: np.ndarray
    local: np.ndarray
    w: int
    rows_per_tile: int
    n_tiles: int
    n_pad: int

    @property
    def t(self) -> int:
        return self.order.shape[0]


def plan_windows(inds: np.ndarray, n_verts: int, rows_per_tile: int = 1024,
                 w2: int = 8, max_window: int = 4096,
                 presorted: bool = False) -> Optional[WindowPlan]:
    """Build a WindowPlan for element corner gathers, or None.

    inds: i32/i64 [T, arity] vertex indices. Elements are sorted by min
    corner (stable) unless presorted. Returns None when any tile's vertex
    span exceeds max_window — the mesh has no usable locality in this
    order and the caller keeps the gather path. W is rounded up to a
    multiple of 8*w2 so the in-kernel reshape [W] -> [W1, w2] and the
    sublane-aligned dynamic slice stay tile-friendly.
    """
    inds = np.asarray(inds)
    t, arity = inds.shape
    if t == 0:
        return None
    if presorted:
        order = np.arange(t, dtype=np.int64)
    else:
        order = np.argsort(inds.min(axis=1), kind="stable")
    sorted_rows = inds[order].reshape(-1).astype(np.int64)  # [T*arity]
    n_rows = sorted_rows.shape[0]
    n_tiles = (n_rows + rows_per_tile - 1) // rows_per_tile
    pad = n_tiles * rows_per_tile - n_rows
    rows = np.concatenate([sorted_rows, np.zeros(pad, np.int64)])
    tiles = rows.reshape(n_tiles, rows_per_tile)
    # Pad rows must not widen windows: give them the tile's own min.
    if pad:
        tiles[-1, rows_per_tile - pad:] = tiles[-1, 0]
    lo = (tiles.min(axis=1) // 8) * 8
    span = int((tiles.max(axis=1) - lo).max()) + 1
    unit = 8 * w2
    w = ((span + unit - 1) // unit) * unit
    if w > max_window:
        return None
    starts = lo.astype(np.int32)
    local = (tiles - lo[:, None]).astype(np.int32)
    return WindowPlan(order=order, starts=starts, local=local, w=w,
                      rows_per_tile=rows_per_tile, n_tiles=n_tiles,
                      n_pad=n_verts + w)


def gather_ref(plan: WindowPlan, inds: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Numpy oracle: the windowed gather equals x[inds[order]].reshape(-1)
    rows (tests)."""
    xp = np.concatenate([x, np.zeros((plan.w, x.shape[1]), x.dtype)])
    out = np.empty((plan.n_tiles * plan.rows_per_tile, x.shape[1]), x.dtype)
    for i in range(plan.n_tiles):
        win = xp[plan.starts[i]:plan.starts[i] + plan.w]
        out[i * plan.rows_per_tile:(i + 1) * plan.rows_per_tile] = win[plan.local[i]]
    return out
