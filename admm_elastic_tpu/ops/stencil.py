"""Gather-free D / D^T for structured (lattice) tet meshes.

XLA:TPU executes arbitrary-index gathers at ~3 GB/s (DESIGN.md r3
"Measurement methodology"), which makes the element pipeline's two
gathers — x[inds] in D x and the vertex gather-table in D^T — the cost
floor of the ADMM local step and rhs at large mesh sizes. For lattice
meshes (make_tet_blocks: nx*ny*nz cells, 5 tets each, parity-alternating
corner patterns — the reference's own beam/box generator, and the class
every large benchmark scene belongs to) both maps are STENCILS:

- every tet corner sits at a constant (di,dj,dk) in {0,1}^3 from its
  cell origin, so x[inds] is 8 static slices of the [X,Y,Z,3] vertex
  grid blended by the cell parity mask;
- D^T's scatter-add accumulates each cell's corner contributions into
  the 8 shifted slices, i.e. 8 padded adds.

Zero gathers, zero scatters — pure streamed elementwise work.

The pattern is DETECTED from the actual index array at build time
(verify_lattice): the mesh factory's claimed dims are checked against
inds, so a user-permuted or hand-edited mesh silently falls back to the
gather path. The stencil and gather paths are exactly equal in exact
arithmetic (same per-element contractions, different addressing); f32/f64
summation order differs only in D^T where a vertex's incident corners
accumulate in corner-major instead of table order.
"""

from __future__ import annotations

from itertools import product
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# meta: (base, X, Y, Z, pat_even, pat_odd) with pat_* a 5x4
# tuple-of-tuples of cube-corner ids (di*4 + dj*2 + dk) and base the
# family's global vertex offset (meshes are staged consecutively).
StencilMeta = Tuple[int, int, int, int, tuple, tuple]

_CORNERS = tuple(product((0, 1), (0, 1), (0, 1)))  # id = di*4 + dj*2 + dk


def verify_lattice(inds: np.ndarray, dims: Tuple[int, int, int],
                   base: int = 0) -> Optional[StencilMeta]:
    """Check LOCAL inds [T,4] (0-based within the mesh) against an
    (nx,ny,nz)-cell lattice; extract the per-(parity, slot, corner)
    cube-corner pattern or return None. `base` is the family's global
    vertex offset recorded into the meta."""
    nx, ny, nz = dims
    X, Y, Z = nx + 1, ny + 1, nz + 1
    inds = np.asarray(inds)
    t = inds.shape[0]
    if t != nx * ny * nz * 5 or inds.shape[1] != 4:
        return None
    cell = np.arange(t) // 5
    slot = np.arange(t) % 5
    ci = cell // (ny * nz)
    cj = (cell // nz) % ny
    ck = cell % nz
    ii = inds // (Y * Z)
    jj = (inds // Z) % Y
    kk = inds % Z
    di = ii - ci[:, None]
    dj = jj - cj[:, None]
    dk = kk - ck[:, None]
    if not ((di >= 0) & (di <= 1) & (dj >= 0) & (dj <= 1)
            & (dk >= 0) & (dk <= 1)).all():
        return None
    corner = di * 4 + dj * 2 + dk  # [T, 4]
    parity = (ci + cj + ck) % 2
    pats = []
    for p in (0, 1):
        sel = parity == p
        if not sel.any():
            return None
        pat = np.zeros((5, 4), np.int64)
        for s in range(5):
            rows = corner[sel & (slot == s)]
            if rows.shape[0] == 0:
                return None
            pat[s] = rows[0]
            if not (rows == rows[0]).all():
                return None
        pats.append(tuple(tuple(int(v) for v in r) for r in pat))
    return (int(base), X, Y, Z, pats[0], pats[1])


def _parity_grid(nx, ny, nz, dtype):
    ci = jax.lax.broadcasted_iota(jnp.int32, (nx, ny, nz), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (nx, ny, nz), 1)
    ck = jax.lax.broadcasted_iota(jnp.int32, (nx, ny, nz), 2)
    return ((ci + cj + ck) % 2 == 0)


def tet_Dx_rows(x, meta: StencilMeta, Dlocal):
    """Stencil equivalent of reduction.tet_Dx_rows -> [9, T]."""
    base, X, Y, Z, pe, po = meta
    nx, ny, nz = X - 1, Y - 1, Z - 1
    xg = x[base:base + X * Y * Z].reshape(X, Y, Z, 3)
    corners = [xg[di:di + nx, dj:dj + ny, dk:dk + nz, :]
               for (di, dj, dk) in _CORNERS]
    par = _parity_grid(nx, ny, nz, x.dtype)[..., None]
    # Per (slot, corner_j) vertex positions [nx,ny,nz,3].
    x4 = [[(corners[pe[s][j]] if pe[s][j] == po[s][j]
            else jnp.where(par, corners[pe[s][j]], corners[po[s][j]]))
           for j in range(4)] for s in range(5)]
    dlg = Dlocal.reshape(nx, ny, nz, 5, 4, 3)
    rows = []
    for r in range(3):
        for c in range(3):
            per_slot = [
                sum(x4[s][j][..., r] * dlg[..., s, j, c] for j in range(4))
                for s in range(5)
            ]
            rows.append(jnp.stack(per_slot, axis=-1).reshape(-1))
    return jnp.stack(rows, axis=0)


# ---------------------------------------------------------------------------
# Triangle sheet stencil (cloth grids)
# ---------------------------------------------------------------------------
#
# Regular cloth sheets (matrix.py _cloth_solver, ref_driver model 3,
# geometry.factory.make_plane) triangulate an (n_s x n_f)-cell vertex grid
# with a CONSTANT per-slot corner pattern — no parity alternation, so the
# meta is even simpler than the tet lattice. Unlike the tet path the grid
# is DETECTED with no factory hint: the fast-axis pitch G1 is inferred
# from the first triangles' index differences and every candidate is fully
# verified against all T index rows, so a false positive is impossible
# (the checks *are* the addressing equivalence).

# meta: (base, G0, G1, slow_major, pats) — vertex grid [G0, G1] with
# vid = slow * G1 + fast; slow_major = whether cells enumerate with the
# slow axis outermost; pats an S x 3 tuple of corner ids (da * 2 + db in
# the enumeration-order axes).
TriStencilMeta = Tuple[int, int, int, bool, tuple]

_CORNERS2 = ((0, 0), (0, 1), (1, 0), (1, 1))


def _check_tri_grid(inds: np.ndarray, v: int, g1: int,
                    base: int) -> Optional[TriStencilMeta]:
    g0 = v // g1
    if g0 < 2 or g1 < 2:
        return None
    slow, fast = inds // g1, inds % g1
    cs, cf = slow.min(axis=1), fast.min(axis=1)
    ds, df = slow - cs[:, None], fast - cf[:, None]
    if not ((ds >= 0) & (ds <= 1) & (df >= 0) & (df <= 1)).all():
        return None
    n_s, n_f = g0 - 1, g1 - 1
    t = inds.shape[0]
    if t % (n_s * n_f):
        return None
    s_cnt = t // (n_s * n_f)
    if not 1 <= s_cnt <= 8:
        return None
    cell = np.arange(t) // s_cnt
    slot = np.arange(t) % s_cnt
    if (cs == cell // n_f).all() and (cf == cell % n_f).all():
        slow_major, da, db = True, ds, df
    elif (cf == cell // n_s).all() and (cs == cell % n_s).all():
        slow_major, da, db = False, df, ds
    else:
        return None
    corner = da * 2 + db  # [T, 3] in enumeration-order axes
    pats = []
    for s in range(s_cnt):
        rows = corner[slot == s]
        if rows.shape[0] == 0 or not (rows == rows[0]).all():
            return None
        pats.append(tuple(int(x) for x in rows[0]))
    return (int(base), g0, g1, slow_major, tuple(pats))


def verify_tri_grid(inds: np.ndarray, base: int = 0,
                    n_local_verts: Optional[int] = None
                    ) -> Optional[TriStencilMeta]:
    """Detect a regular-sheet triangulation from LOCAL inds [T, 3] alone.

    Tries fast-axis pitches implied by the first triangles' index
    differences (the grid pitch or its +-1 neighbors show up there in
    every standard sheet triangulation) and fully verifies each candidate;
    returns the meta or None."""
    inds = np.asarray(inds)
    if inds.ndim != 2 or inds.shape[1] != 3 or inds.shape[0] < 2:
        return None
    v = int(n_local_verts if n_local_verts is not None else inds.max() + 1)
    head = inds[: min(4, inds.shape[0])]
    diffs = np.abs(head[:, :, None] - head[:, None, :]).reshape(-1)
    cands = set()
    for d in diffs[diffs > 0]:
        for g in (int(d) - 1, int(d), int(d) + 1):
            if 2 <= g <= v // 2 and v % g == 0:
                cands.add(g)
    for g1 in sorted(cands):
        meta = _check_tri_grid(inds, v, g1, base)
        if meta is not None:
            return meta
    return None


def tri_Dx_rows(x, meta: TriStencilMeta, Dlocal):
    """Stencil equivalent of reduction.tri_Dx_rows -> [6, T]."""
    base, g0, g1, slow_major, pats = meta
    xg = x[base:base + g0 * g1].reshape(g0, g1, 3)
    if not slow_major:
        xg = xg.transpose(1, 0, 2)
    na, nb = xg.shape[0] - 1, xg.shape[1] - 1
    corners = [xg[da:da + na, db:db + nb, :] for (da, db) in _CORNERS2]
    s_cnt = len(pats)
    dlg = Dlocal.reshape(na, nb, s_cnt, 3, 2)
    rows = []
    for r in range(3):
        for c in range(2):
            per_slot = [
                sum(corners[pats[s][j]][..., r] * dlg[..., s, j, c]
                    for j in range(3))
                for s in range(s_cnt)
            ]
            rows.append(jnp.stack(per_slot, axis=-1).reshape(-1))
    return jnp.stack(rows, axis=0)


def tri_Dt_rows(G_rows, meta: TriStencilMeta, Dlocal, n_verts):
    """Stencil equivalent of reduction.tri_Dt_rows -> [N, 3]."""
    base, g0, g1, slow_major, pats = meta
    na, nb = (g0 - 1, g1 - 1) if slow_major else (g1 - 1, g0 - 1)
    s_cnt = len(pats)
    dlg = Dlocal.reshape(na, nb, s_cnt, 3, 2)
    g = G_rows.reshape(3, 2, na, nb, s_cnt)
    contrib = [[jnp.stack([
        sum(g[r, c, ..., s] * dlg[..., s, j, c] for c in range(2))
        for r in range(3)], axis=-1) for j in range(3)] for s in range(s_cnt)]
    out = jnp.zeros((na + 1, nb + 1, 3), dtype=G_rows.dtype)
    for cid, (da, db) in enumerate(_CORNERS2):
        acc = None
        for s in range(s_cnt):
            for j in range(3):
                if pats[s][j] != cid:
                    continue
                acc = contrib[s][j] if acc is None else acc + contrib[s][j]
        if acc is None:
            continue
        out = out + jnp.pad(acc, ((da, 1 - da), (db, 1 - db), (0, 0)))
    if not slow_major:
        out = out.transpose(1, 0, 2)
    out = out.reshape(-1, 3)
    if base == 0 and out.shape[0] == n_verts:
        return out
    return jnp.pad(out, ((base, n_verts - base - out.shape[0]), (0, 0)))


def tet_Dt_rows(G_rows, meta: StencilMeta, Dlocal, n_verts):
    """Stencil equivalent of reduction.tet_Dt_rows -> [N, 3]."""
    base, X, Y, Z, pe, po = meta
    nx, ny, nz = X - 1, Y - 1, Z - 1
    dlg = Dlocal.reshape(nx, ny, nz, 5, 4, 3)
    g = G_rows.reshape(3, 3, nx, ny, nz, 5)  # [r, c, ...grid..., slot]
    par = _parity_grid(nx, ny, nz, G_rows.dtype)[..., None]
    # contrib[s][j] [nx,ny,nz,3]: sum_c G[r,c] * Dl[s,j,c] stacked over r.
    contrib = [[jnp.stack([
        sum(g[r, c, ..., s] * dlg[..., s, j, c] for c in range(3))
        for r in range(3)], axis=-1) for j in range(4)] for s in range(5)]
    out = jnp.zeros((X, Y, Z, 3), dtype=G_rows.dtype)
    for cid, (di, dj, dk) in enumerate(_CORNERS):
        acc = None
        for s in range(5):
            for j in range(4):
                he, ho = pe[s][j] == cid, po[s][j] == cid
                if not (he or ho):
                    continue
                term = contrib[s][j]
                if not (he and ho):
                    term = jnp.where(par if he else ~par, term, 0.0)
                acc = term if acc is None else acc + term
        if acc is None:
            continue
        pad = ((di, X - nx - di), (dj, Y - ny - dj), (dk, Z - nz - dk),
               (0, 0))
        out = out + jnp.pad(acc, pad)
    out = out.reshape(-1, 3)
    if base == 0 and out.shape[0] == n_verts:
        return out
    return jnp.pad(out, ((base, n_verts - base - out.shape[0]), (0, 0)))
