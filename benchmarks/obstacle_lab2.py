"""Attribute the exact narrow phase's cost at matrix scale (r5, weak #4).

meshobs-exact-500k runs at 286 ms/step vs its SDF sibling's 135 — the
accuracy mode is ~4x behind the throughput mode even though tier-1
compaction already bounds the candidate work to K lanes. This lab
decomposes one detection call at the EXACT matrix geometry (the body's
resting pose on the 6x2x6 slab) into a cumulative stage ladder, so the
difference between consecutive stages attributes each component:

  0 tier-1 gate        cid compute + tet_count gather over all V lanes
  1 + top_k            near-lane compaction to K rows
  2 + face_table       [K, Kf] int32 candidate-id gather
  3 + tri_abc          [K, Kf, 3, 3] candidate-corner gather (the bytes)
  4 + ericson          closest-point + argmin over [K, Kf]
  5 + pseudonormal     [K, 7, 3] nrm gather + feature select
  6 = _narrow          + deep-fallback cond (not taken) + sign
  7 = full call        + scatter-back to V lanes + wrapper

plus Kf/K scaling probes (half the candidate columns / half the
compaction capacity, timing-only) and bake-parameter variants
(cells=64, capture_cells=1.0) to size the fix.

All timings use the slope protocol (DESIGN.md "Measurement
methodology"): lax.scan at two lengths, data-dependent carry, one
readback, slope = (t_hi - t_lo) / (n_hi - n_lo).

Usage: bash benchmarks/tpu_run.sh /tmp/obstacle_lab2.log 3600 600 \
    python -u benchmarks/obstacle_lab2.py
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_scene(nx, ny, nz, cells, capture_cells, depth=0.003):
    """Body vertices in the matrix resting pose + the slab obstacle."""
    from admm_elastic_tpu.collision.passive import PassiveMeshExact
    from admm_elastic_tpu.geometry.factory import make_tet_blocks, make_xform

    body = make_tet_blocks(nx, ny, nz, cell=1.0 / nx)
    # Slab top face is y=-0.1 (matrix geometry); sit the body's bottom
    # layer `depth` below it — the steady contact set.
    body.apply_xform(make_xform(trans=(0.0, -0.1 - depth, 0.0)))
    slab = make_tet_blocks(6, 2, 6, cell=0.25)
    slab.apply_xform(make_xform(trans=(-0.25, -0.6, -0.25)))

    # matrix.py near formula (r5: +2 margin, 512-rounded — K-proportional
    # cost made the old pow2 rounding a measured ~40% tax)
    s_layer = 1.0 / nx
    h_gate = 1.5 / cells
    layers = int(np.ceil(h_gate / s_layer)) + 2
    near = -(-(layers * (nx + 1) * (nz + 1)) // 512) * 512

    m = PassiveMeshExact.from_tet_mesh(
        slab.vertices, slab.tets, cells=cells, capture_cells=capture_cells,
        near_lanes=near)
    return np.asarray(body.vertices), m


def make_stage(m, stage, k_near):
    """One detection call truncated after `stage`, returning a scalar."""
    import jax
    import jax.numpy as jnp

    def fn(p):
        dtype = p.dtype
        dims = jnp.asarray(m.dims, jnp.int32)
        u = (p - m.origin.astype(dtype)) / m.h.astype(dtype)
        ci = jnp.floor(u).astype(jnp.int32)
        in_grid = jnp.all((ci >= 0) & (ci < dims), axis=-1)
        cic = jnp.clip(ci, 0, dims - 1)
        cid = (cic[:, 0] * dims[1] + cic[:, 1]) * dims[2] + cic[:, 2]
        near = in_grid & (m.tet_count[cid] > 0)
        if stage == 0:
            return jnp.sum(near.astype(dtype))
        _, sel = jax.lax.top_k(near.astype(jnp.int32), k_near)
        if stage == 1:
            return jnp.sum(sel.astype(dtype)) * 1e-9
        ps, cids, mask = p[sel], cid[sel], near[sel]
        kf = m.face_table.shape[1]
        fids = m.face_table[cids]
        if stage == 2:
            return jnp.sum(fids.astype(dtype)) * 1e-12
        fmask = (jnp.arange(kf, dtype=jnp.int32)[None, :]
                 < m.face_count[cids][:, None]) & mask[:, None]
        abc = m.tri_abc[fids].astype(dtype)
        if stage == 3:
            return jnp.sum(jnp.where(fmask[..., None, None], abc, 0.0)) * 1e-9
        from admm_elastic_tpu.collision.passive import _pt_tri_closest
        a, b, c = abc[..., 0, :], abc[..., 1, :], abc[..., 2, :]
        closest, v, w = _pt_tri_closest(ps[:, None, :], a, b, c)
        d2 = jnp.sum((ps[:, None, :] - closest) ** 2, axis=-1)
        d2 = jnp.where(fmask, d2, 1e30)
        j = jnp.argmin(d2, axis=1)
        if stage == 4:
            dist = jnp.sqrt(jnp.maximum(
                jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0], 0.0))
            return jnp.sum(jnp.where(mask, dist, 0.0))
        if stage == 5:
            dist, cl, n, any_face = m._closest_feature(ps, fids, fmask)
            return jnp.sum(jnp.where(mask[:, None], n, 0.0))
        if stage == 6:
            dx_k, cl_k, n_k, _ = m._narrow(
                ps, cids, mask, dtype, jnp.asarray(1e30, dtype))
            return jnp.sum(jnp.where(mask, jnp.minimum(dx_k, 1.0), 0.0))
        dx, _, n, _ = m.signed_distance_with_overflow(p)
        return jnp.sum(jnp.where(dx < 1e29, dx, 0.0))

    return fn


def slope_time(fn, p0, n_lo=8, n_hi=32, reps=3):
    """Per-call ms via the scan-slope protocol."""
    import jax
    import jax.numpy as jnp

    def rollout(p, n):
        def body(carry, _):
            p, acc = carry
            out = fn(p)
            return (p + 1e-18 * out, acc + out), None

        (p, acc), _ = jax.lax.scan(body, (p, jnp.asarray(0.0, p.dtype)),
                                   None, length=n)
        return acc + jnp.sum(p[0])

    f_lo = jax.jit(lambda p: rollout(p, n_lo))
    f_hi = jax.jit(lambda p: rollout(p, n_hi))

    def run(f):
        best = 1e9
        for r in range(reps):
            pr = p0 + np.float32(1e-7 * (r + 1))
            t0 = time.perf_counter()
            float(f(pr))
            best = min(best, time.perf_counter() - t0)
        return best

    float(f_lo(p0))  # compile
    float(f_hi(p0))
    t_lo, t_hi = run(f_lo), run(f_hi)
    return (t_hi - t_lo) / (n_hi - n_lo) * 1e3


STAGE_NAMES = ["tier1-gate", "+top_k", "+face_table", "+tri_abc",
               "+ericson", "+pseudonormal", "=_narrow", "=full-call"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=100)
    ap.add_argument("--ny", type=int, default=32)
    ap.add_argument("--nz", type=int, default=32)
    ap.add_argument("--ladder", action="store_true", default=True)
    ap.add_argument("--no-ladder", dest="ladder", action="store_false")
    ap.add_argument("--fb-probe", action="store_true",
                    help="only run the deep-fallback isolation probes")
    ap.add_argument("--steplab", action="store_true",
                    help="step-level A/B at the 500k matrix geometry: "
                         "the SAME body + solver settings with an analytic "
                         "floor at the slab-top height vs the SDF vs the "
                         "exact slab — isolates what the mesh-obstacle "
                         "scenes pay beyond the floor row in situ")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # env var alone does not switch backends here (CLAUDE.md hazard 4)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jnp.asarray([1.0]).block_until_ready()
    print(f"handshake ok: {jax.devices()}", flush=True)

    results = []

    def report(rec):
        results.append(rec)
        print(json.dumps(rec), flush=True)

    if args.steplab:
        import matrix as mx
        from admm_elastic_tpu import Lame, Settings, Solver, binding
        from admm_elastic_tpu.collision.passive import Floor
        from admm_elastic_tpu.geometry.factory import (make_tet_blocks,
                                                       make_xform)

        def floor_solver():
            # _meshobs_solver's body verbatim, obstacle = analytic floor
            # at the slab's top-face height, identical solver settings.
            body = make_tet_blocks(args.nx, args.ny, args.nz,
                                   cell=1.0 / args.nx)
            body.flags = binding.NOSELFCOLLISION | binding.LINEAR
            body.apply_xform(make_xform(trans=(0.0, 0.4, 0.0)))
            sv = Solver()
            binding.add_tetmesh(sv, body, Lame.soft_rubber(), verbose=False)
            sv.add_obstacle(Floor(y=jnp.asarray(-0.1)))
            st = Settings(verbose=0, admm_iters=mx.ADMM_ITERS, linsolver=4,
                          dtype=np.float32, pcg_precond="jacobi",
                          pcg_max_iters=100, pcg_tol=1e-4)
            assert sv.initialize(st)
            return sv

        variants = {
            "floor": floor_solver,
            "sdf": lambda: mx._meshobs_solver(
                args.nx, args.ny, args.nz, "sdf", pcg=("jacobi", 100, 1e-4)),
            "exact": lambda: mx._meshobs_solver(
                args.nx, args.ny, args.nz, "exact",
                pcg=("jacobi", 100, 1e-4)),
        }
        base_ms = None
        for name, build in variants.items():
            sv = build()
            sv.run(10)  # settle into contact (matrix protocol)
            dt = mx._time(sv, steps=3, target_s=0.4, max_steps=60)
            rec = {"config": f"steplab {name}",
                   "ms_per_step": round(dt * 1e3, 2),
                   "min_y": round(float(np.asarray(sv.state.x)[:, 1].min()), 4)}
            if base_ms is None:
                base_ms = dt * 1e3
            else:
                rec["delta_ms_vs_floor"] = round(dt * 1e3 - base_ms, 2)
            report(rec)
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "OBSTACLE_STEPLAB_r5.json")
        with open(out, "w") as f:
            for rec in results:
                f.write(json.dumps(rec) + "\n")
        print(f"wrote {out}", flush=True)
        return

    # ---- base config: the matrix bake -------------------------------
    verts, m = build_scene(args.nx, args.ny, args.nz, cells=32,
                           capture_cells=2.0)
    p0 = jnp.asarray(verts, jnp.float32)
    k = min(int(m.near_lanes), p0.shape[0] - 1)
    near_count = int(jnp.sum(
        (m.tet_count[_cids(m, p0)] > 0).astype(jnp.int32)))
    occ = np.asarray(m.face_count)
    base_meta = {
        "config": "base cells=32 cap=2.0", "V": int(p0.shape[0]),
        "K": k, "Kf": int(m.face_table.shape[1]),
        "gate_marked_lanes": near_count,
        "kf_mean_occupied": round(float(occ[occ > 0].mean()), 1),
    }
    report(base_meta)

    if args.fb_probe:
        # Isolate the always-run deep-fallback block: fallback_lanes=0
        # removes it entirely; the k_fb sweep reveals whether the cost is
        # k_fb-proportional (the [k_fb, F] brute force) or flat (top_k /
        # scatter overhead).
        for fbl in (0, 8, 32, 128, 512):
            mf = dataclasses.replace(m, fallback_lanes=fbl)
            report({"config": f"probe fallback_lanes={fbl}",
                    "ms_per_call": round(
                        slope_time(make_stage(mf, 7, k), p0), 3)})
        return

    if args.ladder:
        prev = 0.0
        for stage in range(8):
            ms = slope_time(make_stage(m, stage, k), p0)
            report({"config": "base", "stage": STAGE_NAMES[stage],
                    "ms_per_call": round(ms, 3),
                    "delta_ms": round(ms - prev, 3)})
            prev = ms

    # ---- scaling probes (timing-only, wrong answers are fine) -------
    kf = m.face_table.shape[1]
    m_kf2 = dataclasses.replace(
        m, face_table=m.face_table[:, : kf // 2],
        face_count=jnp.minimum(m.face_count, kf // 2))
    report({"config": "probe Kf/2", "Kf": kf // 2,
            "ms_per_call": round(slope_time(make_stage(m_kf2, 7, k), p0), 3)})
    m_k2 = dataclasses.replace(m, near_lanes=k // 2)
    report({"config": "probe K/2", "K": k // 2,
            "ms_per_call": round(slope_time(make_stage(m_k2, 7, k // 2), p0), 3)})

    # ---- bake variants ----------------------------------------------
    for cells, cap in ((32, 1.0), (64, 2.0), (64, 1.0), (96, 1.0)):
        verts_v, mv = build_scene(args.nx, args.ny, args.nz, cells=cells,
                                  capture_cells=cap)
        pv = jnp.asarray(verts_v, jnp.float32)
        kv = min(int(mv.near_lanes), pv.shape[0] - 1)
        occ = np.asarray(mv.face_count)
        rec = {"config": f"cells={cells} cap={cap}", "K": kv,
               "Kf": int(mv.face_table.shape[1]),
               "kf_mean_occupied": round(float(occ[occ > 0].mean()), 1),
               "gate_marked_lanes": int(jnp.sum(
                   (mv.tet_count[_cids(mv, pv)] > 0).astype(jnp.int32))),
               "ms_per_call": round(slope_time(make_stage(mv, 7, kv), pv), 3)}
        report(rec)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "OBSTACLE_LAB2_r5.json")
    with open(out, "w") as f:
        for rec in results:
            f.write(json.dumps(rec) + "\n")
    print(f"wrote {out}", flush=True)


def _cids(m, p):
    import jax.numpy as jnp

    dims = jnp.asarray(m.dims, jnp.int32)
    u = (p - m.origin.astype(p.dtype)) / m.h.astype(p.dtype)
    ci = jnp.floor(u).astype(jnp.int32)
    in_grid = jnp.all((ci >= 0) & (ci < dims), axis=-1)
    cic = jnp.clip(ci, 0, dims - 1)
    cid = (cic[:, 0] * dims[1] + cic[:, 1]) * dims[2] + cic[:, 2]
    return jnp.where(in_grid, cid, 0)


if __name__ == "__main__":
    main()
