"""SpMV design lab for the ELL global-step apply (VERDICT r2 item 1).

MEASUREMENT CAVEAT (discovered r3, after this lab first ran): on the
axon backend `block_until_ready` does NOT block — single-dispatch
timings here measure only the enqueue and UNDER-report heavy ops while
dispatch-queue backpressure makes light ops in other processes
OVER-report. The authoritative protocol is the slope method in
/tmp-style probes + benchmarks/global_lab*.py: vary inputs per rep, end
with a scalar readback (costs a flat ~33 ms round trip), and take the
per-iteration cost from the difference of two fused-scan lengths.
Slope-measured truth (160k-tet shapes, f32): ELL row gather ~2.1 ms
(XLA:TPU gathers run ~3 GB/s regardless of index locality); banded/DIA
shift+fma on a [3,N] state ~5 us (871 GB/s, at the HBM roofline);
windowed-dense via vmapped dynamic slices ~3.6 ms (dead). That is why
production (solvers/pcg.py) uses the hybrid DIA + thin-rest format.

Historical variants timed per-dispatch below (kept for the record):

  v0  current form: sum(vals[:,:,None] * x[cols], axis=1)
  v1  per-coordinate flat gathers (scalar gather, no row granularity)
  v2  K-loop of full-length row gathers (one [N] gather per slot)
  v3  jnp.take_along_axis per coordinate (same HLO family as v1)
  dia pure banded/DIA: y_off = sum_d band_d * roll(x, d) -- NO gathers.
      Exact for lattice meshes in lattice order; general meshes use
      band offsets for the popular diagonals + ELL rest (hybrid).
  hyb band part for the popular offsets + v1-gather for the remainder
  pl* Pallas in-kernel gather support probes (recorded, not required)

Run:  python benchmarks/spmv_lab.py  (TPU via the tunnel; f32)
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def lattice_ell(nx, ny, nz, seed=0, shuffle=False):
    """27-point lattice ELL (cols [N,K], vals [N,K]); K=26 off-diagonal.

    shuffle=True randomly permutes vertex ids first -- the adversarial
    no-locality ordering (what an unordered mesh file looks like).
    """
    rng = np.random.default_rng(seed)
    n = nx * ny * nz
    ids = np.arange(n).reshape(nx, ny, nz)
    if shuffle:
        perm = rng.permutation(n)
        ids = perm[ids]
    offs = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
            for k in (-1, 0, 1) if (i, j, k) != (0, 0, 0)]
    cols = np.zeros((n, len(offs)), np.int32)
    vals = np.zeros((n, len(offs)), np.float32)
    for s, (di, dj, dk) in enumerate(offs):
        src = ids
        dst = np.roll(np.roll(np.roll(ids, -di, 0), -dj, 1), -dk, 2)
        ok = np.ones((nx, ny, nz), bool)
        if di == 1: ok[-1] = False
        if di == -1: ok[0] = False
        if dj == 1: ok[:, -1] = False
        if dj == -1: ok[:, 0] = False
        if dk == 1: ok[:, :, -1] = False
        if dk == -1: ok[:, :, 0] = False
        r = src[ok].ravel()
        c = dst[ok].ravel()
        cols[r, s] = c
        vals[r, s] = rng.standard_normal(len(r)).astype(np.float32) * 0.01
    return cols, vals


def time_fn(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    nx = ny = nz = 33
    n = nx * ny * nz
    cols, vals = lattice_ell(nx, ny, nz)
    k = cols.shape[1]
    rng = np.random.default_rng(1)
    x = rng.standard_normal((n, 3)).astype(np.float32)

    d_cols = jnp.asarray(cols)
    d_vals = jnp.asarray(vals)
    d_x = jnp.asarray(x)

    nnz = int((vals != 0).sum())
    # Roofline traffic: vals + cols once, x ~cached, y written.
    bytes_min = nnz * 8 + n * 3 * 4 * 2
    print(f"N={n} K={k} nnz={nnz}  min traffic ~{bytes_min/1e6:.1f} MB "
          f"(~{bytes_min/8.19e11*1e6:.0f} us at 819 GB/s)")

    results = {}

    @jax.jit
    def v0(vals_, cols_, x_):
        return jnp.sum(vals_[:, :, None] * x_[cols_], axis=1)

    @jax.jit
    def v1(vals_, cols_, x_):
        out = [jnp.sum(vals_ * x_[:, c][cols_], axis=1) for c in range(3)]
        return jnp.stack(out, axis=1)

    @jax.jit
    def v2(vals_, cols_, x_):
        acc = jnp.zeros_like(x_)
        for s in range(vals_.shape[1]):
            acc = acc + vals_[:, s, None] * x_[cols_[:, s]]
        return acc

    @jax.jit
    def v3(vals_, cols_, x_):
        out = []
        for c in range(3):
            g = jnp.take_along_axis(x_[:, c][:, None], cols_, axis=0)
            out.append(jnp.sum(vals_ * g, axis=1))
        return jnp.stack(out, axis=1)

    t, ref = time_fn(v0, d_vals, d_cols, d_x)
    results["v0_rowgather"] = t
    for name, fn in [("v1_coordgather", v1), ("v2_kloop", v2),
                     ("v3_takealong", v3)]:
        try:
            t, out = time_fn(fn, d_vals, d_cols, d_x)
            err = float(jnp.abs(out - ref).max())
            results[name] = t
            print(f"{name:18s} {t*1e6:8.0f} us  err={err:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s} FAILED: {str(e)[:120]}", flush=True)
    print(f"{'v0_rowgather':18s} {results['v0_rowgather']*1e6:8.0f} us  (ref)")

    # --- DIA/banded: offsets of the 26 lattice diagonals --------------------
    offsets = np.unique((cols.astype(np.int64) - np.arange(n)[:, None])
                        [vals != 0])
    # Build band values: band[d][i] = A[i, i+off_d] (0 where absent).
    bands = np.zeros((len(offsets), n), np.float32)
    off_of = {o: i for i, o in enumerate(offsets)}
    rr, ss = np.nonzero(vals)
    for r, s in zip(rr, ss):
        bands[off_of[cols[r, s] - r], r] = vals[r, s]
    d_bands = jnp.asarray(bands)
    offs_static = tuple(int(o) for o in offsets)
    print(f"DIA: {len(offsets)} bands")

    @jax.jit
    def dia(bands_, x_):
        acc = jnp.zeros_like(x_)
        for i, o in enumerate(offs_static):
            acc = acc + bands_[i][:, None] * jnp.roll(x_, -o, axis=0)
        return acc

    t, out = time_fn(dia, d_bands, d_x)
    err = float(jnp.abs(out - ref).max())
    print(f"{'dia_roll':18s} {t*1e6:8.0f} us  err={err:.2e}  "
          f"traffic {len(offsets)*n*4/1e6:.1f} MB", flush=True)

    # dynamic-slice variant of the band shift (roll may be slow on TPU)
    xpad = jnp.concatenate([d_x, d_x[: max(offs_static) + 1]], axis=0)

    @jax.jit
    def dia_slice(bands_, x_):
        xp = jnp.concatenate(
            [x_[min(offs_static):], x_, x_[: max(offs_static) + 1]], axis=0)
        base = -min(offs_static)
        acc = jnp.zeros_like(x_)
        for i, o in enumerate(offs_static):
            acc = acc + bands_[i][:, None] * jax.lax.dynamic_slice_in_dim(
                xp, base + o, x_.shape[0], axis=0)
        return acc

    t, out = time_fn(dia_slice, d_bands, d_x)
    err = float(jnp.abs(out - ref).max())
    print(f"{'dia_slice':18s} {t*1e6:8.0f} us  err={err:.2e}", flush=True)

    # --- transposed layout: x as [3, N] (lanes along N) ---------------------
    d_xT = jnp.asarray(x.T.copy())

    @jax.jit
    def dia_T(bands_, xT_):
        xp = jnp.concatenate(
            [xT_[:, min(offs_static):], xT_, xT_[:, : max(offs_static) + 1]],
            axis=1)
        base = -min(offs_static)
        acc = jnp.zeros_like(xT_)
        for i, o in enumerate(offs_static):
            acc = acc + bands_[i][None, :] * jax.lax.dynamic_slice_in_dim(
                xp, base + o, xT_.shape[1], axis=1)
        return acc

    t, out = time_fn(dia_T, d_bands, d_xT)
    err = float(jnp.abs(out.T - ref).max())
    print(f"{'dia_T':18s} {t*1e6:8.0f} us  err={err:.2e}", flush=True)

    # --- shuffled ordering: how bad is the gather with zero locality? ------
    cols_s, vals_s = lattice_ell(nx, ny, nz, shuffle=True)
    t, _ = time_fn(v0, jnp.asarray(vals_s), jnp.asarray(cols_s), d_x)
    print(f"{'v0_shuffled':18s} {t*1e6:8.0f} us", flush=True)

    # --- Pallas support probes ---------------------------------------------
    # DISABLED BY DEFAULT (--pallas-probes): the failing compiles crash the
    # remote tpu_compile_helper ("HTTP 500 ... exit code 1") and the wedged
    # service then HANGS every subsequent compile in the container for
    # minutes. Recorded results (2026-08-17, jax 0.9.0):
    #   take_along_axis(axis=0) in-kernel: compile helper crash (HTTP 500)
    #   take_along_axis(axis=1) in-kernel: compiles OK (lane gather)
    #   jnp.take / fancy row indexing: "Shape mismatch" Mosaic reject
    # -> no sublane gather in this Mosaic; lane-axis gather exists but the
    # XLA v0 form is already at the roofline, so no Pallas kernel needed.
    if "--pallas-probes" not in sys.argv:
        return
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def probe(name, kernel, out_shape, *args):
        try:
            f = pl.pallas_call(
                kernel,
                out_shape=out_shape,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                          for _ in args],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            out = jax.jit(f)(*args)
            jax.block_until_ready(out)
            print(f"pallas {name:24s} OK", flush=True)
            return True
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:110]
            print(f"pallas {name:24s} FAIL: {msg}", flush=True)
            return False

    small_x = jnp.asarray(rng.standard_normal((512, 128)).astype(np.float32))
    idx2d = jnp.asarray(rng.integers(0, 512, (512, 128)).astype(np.int32))
    idx1d = jnp.asarray(rng.integers(0, 512, (512,)).astype(np.int32))

    probe("take_along_axis0", lambda xr, ir, o: o.__setitem__(
        slice(None), jnp.take_along_axis(xr[:], ir[:], axis=0)),
        jax.ShapeDtypeStruct((512, 128), jnp.float32), small_x, idx2d)
    probe("take_along_axis1", lambda xr, ir, o: o.__setitem__(
        slice(None), jnp.take_along_axis(xr[:], ir[:], axis=1)),
        jax.ShapeDtypeStruct((512, 128), jnp.float32), small_x, idx2d)
    probe("take_rows_1d", lambda xr, ir, o: o.__setitem__(
        slice(None), jnp.take(xr[:], ir[:], axis=0)),
        jax.ShapeDtypeStruct((512, 128), jnp.float32), small_x, idx1d)
    probe("fancy_index_rows", lambda xr, ir, o: o.__setitem__(
        slice(None), xr[:][ir[:]]),
        jax.ShapeDtypeStruct((512, 128), jnp.float32), small_x, idx1d)

    # If sublane take_along_axis works, time it at ELL scale.
    if probe("taa0_large", lambda xr, ir, o: o.__setitem__(
            slice(None), jnp.take_along_axis(xr[:], ir[:], axis=0)),
            jax.ShapeDtypeStruct((8192, 128), jnp.float32),
            jnp.asarray(rng.standard_normal((8192, 128)).astype(np.float32)),
            jnp.asarray(rng.integers(0, 8192, (8192, 128)).astype(np.int32))):
        big_x = jnp.asarray(rng.standard_normal((8192, 128)).astype(np.float32))
        big_i = jnp.asarray(rng.integers(0, 8192, (8192, 128)).astype(np.int32))
        f = jax.jit(pl.pallas_call(
            lambda xr, ir, o: o.__setitem__(
                slice(None), jnp.take_along_axis(xr[:], ir[:], axis=0)),
            out_shape=jax.ShapeDtypeStruct((8192, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
        t, _ = time_fn(f, big_x, big_i)
        gb = 8192 * 128 * 8 / 1e9
        print(f"pallas taa0 8192x128: {t*1e6:.0f} us ({gb/t:.0f} GB/s)",
              flush=True)


if __name__ == "__main__":
    main()
