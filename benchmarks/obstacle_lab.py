"""On-chip cost of the passive-obstacle narrow phases (r3).

DESIGN.md's mesh-obstacle section predicts the exact narrow phase sits in
the ~3 GB/s gather regime (~K_f + K_t candidate rows per query) while the
voxel SDF costs ~8 lattice-corner gathers and the analytic floor is free.
This lab measures all three on the same scene so the claim is a number:
a soft block dropped onto (a) an analytic floor, (b) a voxel-SDF slab,
(c) an exact-mesh slab, stepped with AL-PCG (ls=4) at two body sizes.
Detection runs every ADMM iteration (reference semantics), so the
per-step delta / (admm_iters * n_verts) is the per-query cost.

Usage: bash benchmarks/tpu_run.sh /tmp/obstacle_lab.log 3000 600 \
    python -u benchmarks/obstacle_lab.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matrix import ADMM_ITERS  # noqa: E402


def build(kind, nx):
    import jax.numpy as jnp

    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.collision.passive import (
        Floor, PassiveMeshExact, PassiveMeshSDF)
    from admm_elastic_tpu.geometry.factory import make_tet_blocks, make_xform

    body = make_tet_blocks(nx, nx // 2, nx // 2, cell=3.0 / nx)
    body.flags = binding.NOSELFCOLLISION | binding.LINEAR
    body.apply_xform(make_xform(trans=(0.5, 0.3, 0.5)))
    solver = Solver()
    binding.add_tetmesh(solver, body, Lame.soft_rubber(), verbose=False)

    if kind == "floor":
        solver.add_obstacle(Floor(y=jnp.asarray(0.0)))
    else:
        slab = make_tet_blocks(10, 2, 10, cell=0.5)
        slab.apply_xform(make_xform(trans=(-0.5, -1.0, -0.5)))
        # -compact kinds: near-lane compaction (r4). Capacity sized ~3x
        # the body's bottom vertex layer ((nx+1)*(nx/2+1) resting lanes)
        # — it must stay BELOW n_verts or compaction self-disables
        # (k_near < n_lanes guard) and silently measures the dense path.
        near = {16: 512, 32: 2048}[nx] if kind.endswith("-compact") else 0
        if kind.startswith("sdf"):
            # sdf-compact: tier-1 min-corner gate — one 4 B minv scalar
            # per lane decides (minv >= 0 proves the cell contact-free);
            # only straddle/inside-cell lanes pay the 8-row blend.
            solver.add_obstacle(PassiveMeshSDF.from_tet_mesh(
                slab.vertices, slab.tets, resolution=48, near_lanes=near))
        else:
            # exact-compact: tier-1 tet-count gate — only lanes whose
            # cell could contain a penetrating point pay the Kf-wide
            # candidate gathers.
            solver.add_obstacle(PassiveMeshExact.from_tet_mesh(
                slab.vertices, slab.tets, cells=32, near_lanes=near))
    st = Settings(verbose=0, admm_iters=ADMM_ITERS, linsolver=4,
                  gravity=-9.8, dtype=np.float32)
    assert solver.initialize(st)
    return solver


def main():
    import jax
    import jax.numpy as jnp

    jnp.asarray([1.0]).block_until_ready()
    print(f"handshake ok: {jax.devices()}", flush=True)

    for nx in (16, 32):
        base_ms = None
        for kind in ("floor", "sdf", "sdf-compact", "exact", "exact-compact"):
            solver = build(kind, nx)
            n_verts = int(np.asarray(solver.x).shape[0])
            solver.run(10)  # settle into contact
            jax.block_until_ready(solver.state.x)
            # Contact here is frictionless (reference Uzawa/penalty
            # semantics; only NCMCGS's tangent projection is sticky), so
            # the body slowly slides and eventually falls off the finite
            # slab. r3 capped the rollout at 40 steps; post-r4 the packed
            # SDF is ~7x faster, the calibrated rollout got ~7x longer in
            # steps, and the body DID slide off mid-timing — so every
            # timed rollout now restarts from the settled snapshot and
            # each measurement stays within one in-contact window.
            import time as _t

            snap = solver.state
            steps = 10
            best = 1e9
            for rep in range(6):
                solver.state = snap
                t0 = _t.perf_counter()
                solver.run(steps)
                jax.block_until_ready(solver.state.x)
                dt_roll = _t.perf_counter() - t0
                if rep == 0 and dt_roll < 0.3:
                    steps = min(40, max(steps + 1,
                                        int(steps * 0.3 / max(dt_roll, 1e-3))))
                    solver.state = snap
                    t0 = _t.perf_counter()
                    solver.run(steps)
                    jax.block_until_ready(solver.state.x)
                    dt_roll = _t.perf_counter() - t0
                best = min(best, dt_roll)
            dt = best / steps
            ms = dt * 1e3
            x = np.asarray(solver.state.x)
            rec = {
                "kind": kind, "nx": nx, "n_verts": n_verts,
                "ms_per_step": round(ms, 3),
                "min_y": round(float(x[:, 1].min()), 4),
            }
            assert x[:, 1].min() > -0.5, "left contact during timing"
            if kind.endswith("-compact"):
                assert not solver.runtime_data().collision_overflow, \
                    "near-lane capacity overflowed during timing"
            if kind == "floor":
                base_ms = ms
            else:
                # detection runs once per ADMM iteration
                per_query_ns = (ms - base_ms) * 1e6 / (ADMM_ITERS * n_verts)
                rec["delta_ms_vs_floor"] = round(ms - base_ms, 3)
                rec["ns_per_query"] = round(per_query_ns, 1)
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
