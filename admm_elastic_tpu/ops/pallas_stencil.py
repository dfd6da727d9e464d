"""Pallas TPU kernels for the flat-stencil D / Dᵀ applies at small sizes.

At latency-bound scene sizes (the 5k-tet `bench.py` flagship), the jnp
flat-stencil applies (ops/stencil.py tet_Dx_rows / tet_Dt_rows) lower to
a chain of several dependent XLA fusions — pad, 8 shifted slices, parity
blends, 180 FMAs, per-corner scatter pads — each paying a fixed dispatch
cost that dwarfs the (sub-µs) arithmetic. benchmarks/flagship_lab.py
attributed ~26 µs of the 60 µs ADMM iteration to Dx+rhs at 5k tets.
These kernels run each apply as ONE single-program pallas_call with every
intermediate in VMEM:

- ``tet_Dx_rows``: x-block → SoA rows [9, T_cap]. Corner shifts are lane
  rotations (``pltpu.roll``) of the padded vertex stream; rolled-in
  garbage lands only on dead lanes, where Dlocal rows are zero and the
  identity-F injection (+dead) keeps prox well-defined — exactly the jnp
  path's semantics.
- ``tet_rhs_rows``: the ENTIRE rhs elastic term Dᵀ W² (z−u) for a family
  in one kernel — the z−u and ×w² elementwise folds plus the 8-corner
  scatter (zero-padded lane rotations, so every store stays aligned).

Alignment: both kernels require the per-slot lane blocks 128-aligned,
which ops/stencil.py's flat plans guarantee for NON-WRAP families (the
cell axis is padded to the lane width; wrap/ring families keep exact
modular addressing and stay on the jnp path). Eligibility is further
gated to sizes whose working set fits one program's VMEM
(``MAX_CELLS``); large meshes are bandwidth-bound there and the jnp
stencil already streams at roofline (DESIGN.md r3).

The numerical bodies perform the same multiply-add sequence in the same
order as the jnp path, so results agree to FMA-contraction noise;
tests/test_pallas_stencil.py proves interpreter-mode agreement and
tests/test_pallas.py's conventions apply (reference semantics:
src/Solver.cpp:84-98 — D x, local update, b = M x̄ + Δt² Dᵀ W² (z−u)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from admm_elastic_tpu.ops import stencil as stencil_mod
from admm_elastic_tpu.ops.pallas_kernels import _interpret, pallas_enabled

_MODE = "auto"

# One-program VMEM budget: dl (60·cells·4B) + z/u/out rows (3·45·cells·4B)
# + temporaries ≈ 1 MB at 2048 cells, ~4 MB at 8192 — comfortably inside
# the ~16 MB/core budget with Mosaic's own temporaries.
MAX_CELLS = 8192


def set_stencil_kernel_mode(mode: str) -> None:
    """'auto' (follow pallas_kernels' mode) or 'off' (jnp stencil only)."""
    global _MODE
    if mode not in ("auto", "off"):
        raise ValueError(f"bad stencil kernel mode {mode!r}")
    _MODE = mode


def eligible(b, dtype) -> bool:
    """Trace-time predicate: run this family's D applies in Pallas?"""
    if _MODE == "off" or b.stencil is None:
        return False
    base, X, Y, Z, pe, po, wrap = b.stencil
    if wrap:  # ring families keep exact modular addressing (jnp path)
        return False
    if getattr(b, "st_par", None) is None:  # tris: no parity field (yet)
        return False
    cells = b.st_par.shape[0]
    if cells % 128 != 0 or cells > MAX_CELLS:
        return False
    return pallas_enabled(dtype)


def _geom(b):
    base, cells, n_vblock, offs, pe, po, wrap = stencil_mod._tet_geom(b.stencil)
    # Stream length: covers the vertex block and every corner shift, lane
    # aligned so head slices and concat halves stay aligned in Mosaic.
    P = stencil_mod._pad128(max(n_vblock, cells + max(offs)))
    return base, cells, n_vblock, offs, pe, po, P


# ---------------------------------------------------------------------------
# D x
# ---------------------------------------------------------------------------

def _dx_blocks(xp, dl_ref, par, dead, *, offs, pe, po, cells):
    """Shared Dx body: [9][5] per-(row, slot) blocks of [1, cells]."""
    P = xp.shape[1]
    # Corner reads x[p + d]: roll left by d (= right by P - d), then the
    # aligned head block. Wrapped-in values land only on dead lanes.
    xc = [(pltpu.roll(xp, P - d, 1) if d else xp)[:, :cells] for d in offs]
    inv = 1.0 - par
    blocks = [[None] * 5 for _ in range(9)]
    for s in range(5):
        xs = []
        for j in range(4):
            e, o = pe[s][j], po[s][j]
            xs.append(xc[e] if e == o else par * xc[e] + inv * xc[o])
        for r in range(3):
            for c in range(3):
                row = sum(xs[j][r:r + 1] * dl_ref[(s * 4 + j) * 3 + c:
                                                  (s * 4 + j) * 3 + c + 1]
                          for j in range(4))
                if r == c:
                    row = row + dead  # identity F on dead lanes
                blocks[r * 3 + c][s] = row
    return blocks


def _dt_total(g9, dl_ref, par, P, dtype, *, offs, pe, po, cells):
    """Shared Dᵀ body: 9-tuple of [1, T_cap] weighted rows -> [3, P]."""
    inv = 1.0 - par
    acc = [None] * 8
    for s in range(5):
        sl = slice(s * cells, (s + 1) * cells)
        for j in range(4):
            contrib = jnp.concatenate([
                sum(g9[r * 3 + c][:, sl]
                    * dl_ref[(s * 4 + j) * 3 + c:(s * 4 + j) * 3 + c + 1]
                    for c in range(3))
                for r in range(3)
            ], axis=0)  # [3, cells]
            he, ho = pe[s][j], po[s][j]
            if he == ho:
                acc[he] = contrib if acc[he] is None else acc[he] + contrib
            else:
                e = par * contrib
                o = inv * contrib
                acc[he] = e if acc[he] is None else acc[he] + e
                acc[ho] = o if acc[ho] is None else acc[ho] + o
    total = jnp.zeros((3, P), dtype)
    zpad = jnp.zeros((3, P - cells), dtype)
    for cid, d in enumerate(offs):
        if acc[cid] is None:
            continue
        a = jnp.concatenate([acc[cid].astype(dtype), zpad], axis=1)
        # out[p + d] += acc[p]: right-rotate the zero-padded block — the
        # wrapped-in tail is the zero pad (d <= maxd <= P - cells).
        total = total + (pltpu.roll(a, d, 1) if d else a)
    return total


def _dx_kernel(xp_ref, dl_ref, par_ref, dead_ref, o_ref, *, offs, pe, po,
               cells):
    blocks = _dx_blocks(xp_ref[:], dl_ref, par_ref[:], dead_ref[:],
                        offs=offs, pe=pe, po=po, cells=cells)
    for i in range(9):
        for s in range(5):
            o_ref[i:i + 1, s * cells:(s + 1) * cells] = blocks[i][s]


def tet_Dx_rows(x, b):
    """Pallas flat-stencil D x → SoA rows [9, T_cap] (eligible() families)."""
    base, cells, n_vblock, offs, pe, po, P = _geom(b)
    xT = x[base:base + n_vblock].T
    xp = jnp.pad(xT, ((0, 0), (0, P - n_vblock)))
    dl2 = b.st_dl.reshape(60, cells)
    kern = functools.partial(_dx_kernel, offs=offs, pe=pe, po=po, cells=cells)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((9, 5 * cells), x.dtype),
        interpret=_interpret(),
    )(xp, dl2, b.st_par.reshape(1, cells), b.st_dead.reshape(1, cells))


# ---------------------------------------------------------------------------
# rhs elastic term: D^T W^2 (z - u)
# ---------------------------------------------------------------------------

def _rhs_kernel(z_ref, u_ref, w2_ref, dl_ref, par_ref, o_ref, *, offs, pe,
                po, cells):
    g = (z_ref[:] - u_ref[:]) * w2_ref[:]
    g9 = tuple(g[r:r + 1] for r in range(9))
    o_ref[:] = _dt_total(g9, dl_ref, par_ref[:], o_ref.shape[1], o_ref.dtype,
                         offs=offs, pe=pe, po=po, cells=cells)


def tet_rhs_rows(z, u, b, n_verts):
    """Pallas D^T W^2 (z-u) for one flat-stencil family → [N, 3].

    Folds the rhs elementwise chain (z-u, ×w², src/Solver.cpp:98) into the
    Dᵀ kernel. Dead lanes carry w² = 0, so no live-masking is needed.
    """
    base, cells, n_vblock, offs, pe, po, P = _geom(b)
    dl2 = b.st_dl.reshape(60, cells)
    w2 = (b.weight * b.weight)[None, :]
    kern = functools.partial(_rhs_kernel, offs=offs, pe=pe, po=po, cells=cells)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((3, P), z.dtype),
        interpret=_interpret(),
    )(z, u, w2, dl2, b.st_par.reshape(1, cells))
    outT = out[:, :n_vblock].T
    if base == 0 and n_vblock == n_verts:
        return outT
    return jnp.pad(outT, ((base, n_verts - base - n_vblock), (0, 0)))


# A fully-fused local+rhs megakernel (Dx -> prox -> dual -> Dᵀ in ONE
# pallas_call per iteration) was built and MEASURED SLOWER — 98.1 us/iter
# vs 46.0 for this two-kernel split at flagship geometry
# (STENCIL_KERNEL_LAB_r5.json: "auto" = megakernel in that session,
# "nofuse" = the split that is now the production path). The one-program
# prox over the whole family (7200 lanes of projected-Newton temporaries
# live at once) schedules far worse than the gridded 1024-lane prox
# kernel it replaced, swamping the two saved kernel launches. Rejected
# and removed; trajectories of all three paths were bitwise equal.
