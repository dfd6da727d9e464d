"""Can a windowed one-hot MXU matmul beat XLA's 3 GB/s gather?

Motivation: lattice meshes got gather-free D/D^T stencils (ops/stencil.py)
but IRREGULAR meshes (torus, bunny, user .node/.ele files) still pay the
~3 GB/s arbitrary-index gather for x[inds] and the D^T gather-table sum
(DESIGN.md r3 measurement: locality does not help XLA's TPU gather).

Hypothesis: mesh gathers have bounded *windows* — after sorting elements
by their min vertex, every tile of R consecutive rows reads only a W-wide
vertex window. A gather from a W-window is a [R, W] one-hot times the
[W, 3] window: MXU work, no HBM gather. Two-level decomposition
(idx = a*W2 + b) shrinks the one-hot build from R*W to R*W1 + R*W2
VPU compares: select the W2-group by MXU matmul, then the in-group row by
a W2-way VPU select.

Variants measured under the slope protocol (DESIGN.md):
  A  x[idx]                      XLA gather baseline (row gather)
  B  jnp two-level window        vmapped dynamic_slice windows, no Pallas
  C  pallas two-level window     x VMEM-resident, per-tile pl.ds window
  D  pallas direct x_ref[idx]    Mosaic's own VMEM gather, if it lowers
  E  [N, K] table-gather + sum   the dt_gather (D^T) baseline shape

Usage: bash benchmarks/tpu_run.sh /tmp/gather_lab.log 1800 120 \
    python -u benchmarks/gather_lab.py [--n 35721 --rows 655360 --w 512]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from global_lab3 import slope  # noqa: E402  (same slope protocol)


def synth_indices(n, rows, w, seed=0):
    """Mesh-like gather indices: row r reads near vertex r*N/rows, within a
    +-w/3 neighborhood — every R-row tile then fits a W window, like sorted
    tet corners do."""
    rng = np.random.default_rng(seed)
    center = (np.arange(rows, dtype=np.int64) * n) // rows
    jitter = rng.integers(-(w // 3), w // 3, size=rows)
    return np.clip(center + jitter, 0, n - 1).astype(np.int32)


def plan_windows(idx, n, rows_per_tile, w):
    """Tile rows; per tile a window start so all local ids in [0, W)."""
    n_tiles = (idx.shape[0] + rows_per_tile - 1) // rows_per_tile
    pad_rows = n_tiles * rows_per_tile
    idx_p = np.concatenate([idx, np.zeros(pad_rows - idx.shape[0], np.int32)])
    tiles = idx_p.reshape(n_tiles, rows_per_tile)
    lo = (tiles.min(axis=1) // 8) * 8  # sublane-aligned dynamic slices
    hi = tiles.max(axis=1)
    assert int((hi - lo).max()) < w, f"window overflow: {(hi - lo).max()} >= {w}"
    starts = np.minimum(lo, n)  # x is padded to n + w rows
    local = tiles - starts[:, None]
    return starts.astype(np.int32), local.astype(np.int32), n_tiles


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=35721)
    ap.add_argument("--rows", type=int, default=655360)  # ~160k tets * 4
    ap.add_argument("--w", type=int, default=512)
    ap.add_argument("--rows-per-tile", type=int, default=1024)
    ap.add_argument("--w2", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jnp.asarray([1.0]).block_until_ready()
    print(f"handshake ok: {jax.devices()}", flush=True)

    n, rows, w = args.n, args.rows, args.w
    rpt, w2 = args.rows_per_tile, args.w2
    w1 = w // w2
    assert w1 * w2 == w

    idx = synth_indices(n, rows, w)
    starts_np, local_np, n_tiles = plan_windows(idx, n, rpt, w)
    print(f"n={n} rows={rows} tiles={n_tiles} W={w} (W1={w1} x W2={w2})",
          flush=True)

    rng = np.random.default_rng(1)
    x_np = rng.standard_normal((n, 3)).astype(np.float32)
    x_pad_np = np.concatenate([x_np, np.zeros((w, 3), np.float32)])

    idx_d = jnp.asarray(idx)
    starts = jnp.asarray(starts_np)
    local = jnp.asarray(local_np)  # [n_tiles, rpt]
    x0 = jnp.asarray(x_np)
    oracle = np.asarray(x_np[idx])

    bytes_useful = rows * 12 * 2  # read + write of the gathered rows

    def report(name, t, out_fn=None):
        err = ""
        if out_fn is not None:
            got = np.asarray(out_fn(x0))[: rows]
            e = np.abs(got - oracle).max()
            err = f"maxerr={e:.2e}"
        print(f"{name:28s} {t*1e6:9.1f} us  {bytes_useful/t/1e9:7.1f} GB/s  {err}",
              flush=True)

    def scan_of(body):
        def make(nlen):
            @jax.jit
            def loop(seed):
                def f(c, _):
                    return body(c), None
                out, _ = jax.lax.scan(f, x0 * seed, None, length=nlen)
                return out
            return loop
        return make

    tiny = np.float32(1e-20)

    # --- A: XLA row gather ------------------------------------------------
    def a_fn(x):
        return x[idx_d]
    report("A xla row gather", slope(scan_of(
        lambda x: x * (1.0 + tiny * jnp.sum(a_fn(x))))), None)

    # --- B: jnp two-level windowed ----------------------------------------
    iota_w1 = jnp.arange(w1, dtype=jnp.int32)

    def b_fn(x):
        xp = jnp.concatenate([x, jnp.zeros((w, 3), x.dtype)])

        def tile(s, lidx):
            xw = jax.lax.dynamic_slice(xp, (s, 0), (w, 3))  # [W, 3]
            a = lidx // w2
            b = lidx % w2
            onehot = (a[:, None] == iota_w1[None, :]).astype(x.dtype)
            grp = jnp.matmul(onehot, xw.reshape(w1, w2 * 3),
                             precision=jax.lax.Precision.HIGHEST)
            grp = grp.reshape(rpt, w2, 3)
            sel = (b[:, None] == jnp.arange(w2, dtype=jnp.int32)[None, :])
            return jnp.sum(grp * sel[..., None].astype(x.dtype), axis=1)

        return jax.vmap(tile)(starts, local).reshape(-1, 3)

    report("B jnp windowed 2-level", slope(scan_of(
        lambda x: x * (1.0 + tiny * jnp.sum(b_fn(x))))), b_fn)

    # --- C: Pallas two-level windowed -------------------------------------
    local_flat = jnp.asarray(local_np.reshape(-1))  # [n_tiles * rpt]
    assert w2 == 8, "variant C pins w2=8 (starts are 8-aligned)"

    def c_kernel(starts_ref, local_ref, x2_ref, out_ref):
        # x2_ref is x pre-reshaped [n_pad//8, 24]: the window slice is
        # ALREADY [w1, w2*3] (Mosaic cannot reshape (512,3)->(64,24)).
        i = pl.program_id(0)
        s = starts_ref[i]
        xg = x2_ref[pl.ds(s // 8, w // 8), :]  # [w1, 24]
        lidx = local_ref[:].reshape(rpt, 1)
        a = lidx // w2
        b = lidx % w2
        onehot = (a == jax.lax.broadcasted_iota(jnp.int32, (rpt, w1), 1)
                  ).astype(jnp.float32)
        grp = jax.lax.dot(onehot, xg,
                          precision=jax.lax.Precision.HIGHEST)  # [rpt, 24]
        acc = jnp.zeros((rpt, 3), jnp.float32)
        for k in range(w2):
            acc = acc + jnp.where(b == k, grp[:, 3 * k:3 * k + 3], 0.0)
        out_ref[:] = acc

    try:
        # x as a whole-array VMEM input: copy in once per call.
        def c_fn(x):
            xp = jnp.concatenate([x, jnp.zeros((w + (-n) % 8, 3), x.dtype)])
            xp = xp.reshape(-1, 24)
            return pl.pallas_call(
                c_kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(n_tiles,),
                    in_specs=[
                        pl.BlockSpec((rpt,), lambda i, s_ref: (i,)),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((rpt, 3), lambda i, s_ref: (i, 0)),
                ),
                out_shape=jax.ShapeDtypeStruct((n_tiles * rpt, 3), jnp.float32),
            )(starts, local_flat, xp)

        c_fn_j = jax.jit(c_fn)
        _ = c_fn_j(x0).block_until_ready()
        report("C pallas windowed 2-level", slope(scan_of(
            lambda x: x * (1.0 + tiny * jnp.sum(c_fn(x))))), c_fn)
    except Exception as e:  # noqa: BLE001
        print(f"C pallas windowed FAILED: {type(e).__name__}: {e}", flush=True)

    # --- D: Pallas direct VMEM gather (does Mosaic lower it at all?) ------
    def d_kernel(idx_ref, x_ref, out_ref):
        out_ref[:] = x_ref[idx_ref[:], :]

    try:
        def d_fn(x):
            xp = jnp.concatenate([x, jnp.zeros((w, 3), x.dtype)])
            return pl.pallas_call(
                d_kernel,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((rpt,), lambda i: (i,)),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((rpt, 3), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((n_tiles * rpt, 3), jnp.float32),
            )(jnp.asarray((starts_np[:, None] + local_np).reshape(-1)), xp)

        d_fn_j = jax.jit(d_fn)
        _ = d_fn_j(x0).block_until_ready()
        report("D pallas vmem gather", slope(scan_of(
            lambda x: x * (1.0 + tiny * jnp.sum(d_fn(x))))), d_fn)
    except Exception as e:  # noqa: BLE001
        print(f"D pallas vmem gather FAILED: {type(e).__name__}: {e}", flush=True)

    # --- E: [N, K] dt_gather-shaped baseline -------------------------------
    k_tab = 24
    tab = np.minimum(
        np.arange(n, dtype=np.int64)[:, None] * rows // n
        + np.arange(k_tab)[None, :], rows - 1).astype(np.int32)
    tab_d = jnp.asarray(tab)

    def e_fn(x):
        big = jnp.tile(x, (rows // n + 1, 1))[:rows]
        return jnp.sum(big[tab_d], axis=1)

    report("E [N,K] table gather+sum", slope(scan_of(
        lambda x: x * (1.0 + tiny * jnp.sum(e_fn(x))))), None)


if __name__ == "__main__":
    main()
