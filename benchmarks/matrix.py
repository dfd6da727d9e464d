"""Ours-vs-reference benchmark matrix.

Runs the TPU build on the same scene x size grid measured from the
reference binary by run_baseline_matrix.sh (benchmarks/BASELINE_MATRIX.json)
and emits one JSON line per scene with admm_iters_per_s and the ratio
vs the recorded reference number (VERDICT r1 item 2: every headline number
gets a measured denominator).

Run on the TPU terminal:  python benchmarks/matrix.py [--out FILE]
Scenes follow the labels in run_baseline_matrix.sh; geometry matches
ref_driver.cpp (same make_tet_blocks pattern, soft-rubber Lame, lumped
masses at rubber density, pinned -x face / floor drops / cloth sheet).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ADMM_ITERS = 10


def _beam_solver(nx, ny, nz, model, linsolver, floor_y=None, dtype=None,
                 pcg=("jacobi", 40, 1e-6)):
    import jax.numpy as jnp

    from admm_elastic_tpu import Floor, Lame, Settings, Solver, binding
    from admm_elastic_tpu.geometry.factory import make_tet_blocks

    mesh = make_tet_blocks(nx, ny, nz)
    flags = {"linear": binding.LINEAR, "nh": binding.NEOHOOKEAN,
             "stvk": binding.STVK}[model]
    mesh.flags = binding.NOSELFCOLLISION | flags
    solver = Solver()
    binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
    if floor_y is None:
        pins = [int(i) for i in np.where(mesh.vertices[:, 0] < 1e-9)[0]]
        solver.set_pins(pins)
    else:
        solver.add_obstacle(Floor(y=jnp.asarray(floor_y)))
    precond, iters, tol = pcg
    st = Settings(verbose=0, admm_iters=ADMM_ITERS, linsolver=linsolver,
                  dtype=dtype or np.float32, pcg_precond=precond,
                  pcg_max_iters=iters, pcg_tol=tol,
                  uzawa_max_iters=10, uzawa_inner_tol=1e-5,
                  uzawa_inner_iters=60)
    assert solver.initialize(st)
    return solver


def _torus_solver(n_ring, n_sec, linsolver=3, pcg=("jacobi", 60, 1e-6)):
    """Solid NH torus pinned at the s=0 cross-section ring — matches
    ref_driver.cpp model 6. The ring wrap makes this mesh irregular for
    any plain lattice detector; the wrap-aware ring stencil covers it."""
    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.geometry.factory import make_tet_torus

    mesh = make_tet_torus(n_ring=n_ring, n_sec=n_sec)
    mesh.flags = binding.NOSELFCOLLISION | binding.NEOHOOKEAN
    solver = Solver()
    binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
    solver.set_pins(list(range((n_sec + 1) ** 2)))
    precond, iters, tol = pcg
    st = Settings(verbose=0, admm_iters=ADMM_ITERS, linsolver=linsolver,
                  dtype=np.float32, pcg_precond=precond, pcg_max_iters=iters,
                  pcg_tol=tol)
    assert solver.initialize(st)
    return solver


def _cloth_solver(nx, ny, limits=None, wind=None, gravity=-9.8):
    """xz-plane sheet pinned at the -x edge — same geometry as
    ref_driver.cpp model 3 (and tests/test_parity.py wind scene)."""
    from admm_elastic_tpu import Lame, Settings, Solver
    from admm_elastic_tpu.forces import make_wind_force

    verts = np.array(
        [[i, 0.0, j * nx / ny] for i in range(nx + 1) for j in range(ny + 1)],
        dtype=np.float64,
    )
    vid = lambda i, j: i * (ny + 1) + j
    tris = []
    for i in range(nx):
        for j in range(ny):
            tris.append([vid(i, j), vid(i + 1, j), vid(i, j + 1)])
            tris.append([vid(i + 1, j), vid(i + 1, j + 1), vid(i, j + 1)])
    tris = np.asarray(tris)
    n_verts = len(verts)
    masses = np.zeros(n_verts)
    for t in tris:
        p = verts[t]
        area = 0.5 * np.linalg.norm(np.cross(p[1] - p[0], p[2] - p[0]))
        masses[t] += 1522.0 * area / 3.0

    solver = Solver()
    solver.add_nodes(verts, masses)
    lame = Lame.from_youngs_poisson(10000000, 0.399)
    if limits is not None:
        lame.limit_min, lame.limit_max = limits
    solver.add_tri_energies(verts, tris, lame)
    pins = [int(i) for i in np.where(verts[:, 0] < 1e-9)[0]]
    solver.set_pins(pins)
    if wind is not None:
        # colored: sequential's Gauss-Seidel stability (the batched
        # Jacobi-like form over-kicks shared vertices and diverges on
        # exactly the scenes the reference survives) at ~8 batched color
        # steps instead of a W-step scan — the TPU-native stable form.
        solver.add_explicit_force(
            make_wind_force(tris, direction=wind, colored=True))
    st = Settings(verbose=0, admm_iters=ADMM_ITERS, linsolver=3,
                  dtype=np.float32, gravity=gravity,
                  pcg_max_iters=40, pcg_tol=1e-6)
    assert solver.initialize(st)
    return solver


def _meshobs_solver(nx, ny, nz, narrow, linsolver=4,
                    pcg=("jacobi", 80, 1e-4)):
    """ref_driver model 5 at scale: a soft body (make_tet_blocks scaled to
    unit x-extent, dropped from y=0.4) onto the tet-meshed 6x2x6 slab
    (top face y=-0.1), resolved through PassiveMesh on the reference side
    and the chosen TPU narrow phase here (VERDICT r3 weak #4: obstacles
    were the last contact path without a matrix row)."""
    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.collision.passive import (PassiveMeshExact,
                                                    PassiveMeshSDF)
    from admm_elastic_tpu.geometry.factory import make_tet_blocks, make_xform

    body = make_tet_blocks(nx, ny, nz, cell=1.0 / nx)
    body.flags = binding.NOSELFCOLLISION | binding.LINEAR
    body.apply_xform(make_xform(trans=(0.0, 0.4, 0.0)))
    solver = Solver()
    binding.add_tetmesh(solver, body, Lame.soft_rubber(), verbose=False)

    slab = make_tet_blocks(6, 2, 6, cell=0.25)
    slab.apply_xform(make_xform(trans=(-0.25, -0.6, -0.25)))
    # near_lanes (r4): tier-1 compaction — only lanes that could be
    # penetrating pay the narrow-phase gathers. Capacity is derived from
    # the gate-band geometry: the tier-1 gate marks every body layer
    # within one GATE CELL above the surface (exact: cells overlapping a
    # slab tet's AABB reach <= h_grid = 1.5/32 above the top face; SDF:
    # minv<0 straddle cells reach <= h_sdf = 1.7/47), so the steady
    # near set is ceil(h_gate / layer_spacing) layers, plus 2 layers of
    # margin (cell alignment, resting jitter). The r3 formula (flat 3
    # layers) under-counted at 160k where one gate cell spans ~4 body
    # layers and the exact-160k timing overflowed; the r4 formula (+4
    # margin, pow2-rounded) over-provisioned ~2x — and obstacle_lab2
    # measured the whole narrow phase K-PROPORTIONAL (K/2 probe: 13.85
    # -> 6.88 ms/call at 500k), so capacity slack is paid linearly every
    # detection. r5: +2 margin, rounded up to 512 lanes (measured steady
    # near set at 500k: 16665 = 5 layers; this grants 7).
    # Warm-up IMPACT steps may still overflow (the drop arrives at
    # ~2.4 m/s = 8 layers/step — warned honestly by Solver.run); the
    # runner asserts RuntimeData.collision_overflow clean over the TIMED
    # window only.
    # cells=64 (r5): the candidate capacity Kf stays 8 while the gate
    # band (and so the near set K) halves — obstacle_lab2 measured the
    # isolated 500k narrow phase at 3.72 ms/call vs 4.86 at cells=32.
    cells = 64
    s_layer = 1.0 / nx
    h_gate = 1.5 / cells if narrow == "exact" else 1.7 / 47
    layers = int(np.ceil(h_gate / s_layer)) + 2
    near = -(-(layers * (nx + 1) * (nz + 1)) // 512) * 512
    if narrow == "exact":
        solver.add_obstacle(PassiveMeshExact.from_tet_mesh(
            slab.vertices, slab.tets, cells=cells, near_lanes=near))
    else:
        solver.add_obstacle(PassiveMeshSDF.from_tet_mesh(
            slab.vertices, slab.tets, resolution=48, near_lanes=near))
    precond, iters, tol = pcg
    st = Settings(verbose=0, admm_iters=ADMM_ITERS, linsolver=linsolver,
                  dtype=np.float32, pcg_precond=precond, pcg_max_iters=iters,
                  pcg_tol=tol)
    assert solver.initialize(st)
    return solver


def _boxes_solver(n, linsolver):
    import jax.numpy as jnp

    from admm_elastic_tpu import Floor, Lame, Settings, Solver, binding
    from admm_elastic_tpu.geometry.factory import make_tet_blocks, make_xform

    solver = Solver()
    for i in range(2):
        m = make_tet_blocks(n, n, n, cell=1.0 / n)
        m.apply_xform(make_xform(trans=(0.0, i * 1.25, 0.0)))
        m.flags = binding.LINEAR
        binding.add_tetmesh(solver, m, Lame.rubber(), verbose=False)
    solver.add_obstacle(Floor(y=jnp.asarray(-0.5)))
    st = Settings(verbose=0, admm_iters=ADMM_ITERS, linsolver=linsolver,
                  dtype=np.float32, pcg_max_iters=60, pcg_tol=1e-6)
    assert solver.initialize(st)
    return solver


def _time(solver, steps=10, reps=5, target_s=1.0, max_steps=600):
    """Per-step seconds from calibrated fused rollouts.

    The TPU sits behind a tunnel whose per-dispatch latency varies by
    ~100 ms BETWEEN sessions; a 10-step rollout of a 3.6 ms/step scene is
    then >70% overhead and the recorded ratio is session luck (VERDICT r2
    weak #2: 708 vs 2770 iters/s on the same scene from the two
    harnesses). Grow the rollout until one dispatch costs >= target_s so
    overhead is <~10%, then take the best of `reps` — identical policy to
    bench.py."""
    import jax

    def once(n):
        t0 = time.perf_counter()
        solver.run(n)
        jax.block_until_ready(solver.state.x)
        return time.perf_counter() - t0

    solver.run(1)
    jax.block_until_ready(solver.state.x)
    t = once(steps)
    while t < target_s and steps < max_steps:
        grow = max(2.0, target_s / max(t, 1e-3))
        steps = min(max_steps, max(steps + 1, int(steps * grow)))
        t = once(steps)
    best = t
    for _ in range(reps - 1):
        best = min(best, once(steps))
    x = np.asarray(solver.state.x)
    assert np.isfinite(x).all(), "non-finite state after timing rollout"
    return best / steps


SCENES = {
    # label -> (builder, ref_label)  [ref_label = run_baseline_matrix.sh]
    # ls=0: the prefactored equilibrated-inverse mode — the right mode at
    # this size and the apples-to-apples peer of the reference's LDLT.
    "beam-nh-5k": lambda: _beam_solver(40, 5, 5, "nh", 0),
    "beam-nh-40k": lambda: _beam_solver(80, 10, 10, "nh", 3),
    # Post-r3 banded SpMV the step is no longer solve-dominated and plain
    # Jacobi beats the two-grid V-cycle (whose transfers are gather-bound):
    # 97.2 vs 87.9 iters/s measured at 160k (A/B r3).
    "beam-nh-160k": lambda: _beam_solver(80, 20, 20, "nh", 3,
                                         pcg=("jacobi", 120, 1e-6)),
    "beam-floor-gs-5k": lambda: _beam_solver(40, 5, 5, "nh", 1, floor_y=-1.0),
    "beam-floor-uzawa-5k": lambda: _beam_solver(40, 5, 5, "nh", 2, floor_y=-1.0),
    "beam-floor-uzawa-67k": lambda: _beam_solver(60, 15, 15, "linear", 2,
                                                 floor_y=-1.0),
    "beam-floor-alpcg-67k": lambda: _beam_solver(60, 15, 15, "linear", 4,
                                                 floor_y=-1.0,
                                                 pcg=("jacobi", 120, 1e-6)),
    # Loose inner tolerance: ADMM is the outer iteration and the AL
    # multiplier absorbs residual constraint error; measured 2x faster
    # than tol=1e-6 with the floor still held to ~5e-4.
    "beam-floor-alpcg-67k-fast": lambda: _beam_solver(
        60, 15, 15, "linear", 4, floor_y=-1.0, pcg=("jacobi", 60, 1e-3)),
    "beam-floor-alpcg-160k": lambda: _beam_solver(
        80, 20, 20, "linear", 4, floor_y=-1.0, pcg=("jacobi", 80, 1e-4)),
    # North-star sizes (BASELINE.json configs 4/2): ~512k-tet solid
    # (110k verts) and ~51k-tri cloth. Reference denominators come from
    # BIG=1 bash run_baseline_matrix.sh.
    "beam-nh-500k": lambda: _beam_solver(100, 32, 32, "nh", 3,
                                         pcg=("jacobi", 150, 1e-6)),
    "beam-floor-alpcg-500k": lambda: _beam_solver(
        100, 32, 32, "linear", 4, floor_y=-1.0, pcg=("jacobi", 100, 1e-4)),
    # Torus: periodic ring lattice (irregular for a plain lattice
    # detector; the wrap-aware stencil covers it, ops/stencil.py).
    "torus-nh-20k": lambda: _torus_solver(64, 8),
    "torus-nh-160k": lambda: _torus_solver(128, 16,
                                           pcg=("jacobi", 120, 1e-6)),
    "torus-nh-500k": lambda: _torus_solver(400, 16,
                                           pcg=("jacobi", 150, 1e-6)),
    "cloth-limit-160": lambda: _cloth_solver(160, 160,
                                             limits=(0.95, 1.05)),
    # Gentle wind + zero gravity: the reference WindForce adds the kick
    # straight to velocity (no mass division) and diverges outside this
    # regime (see tests/test_parity.py wind scene note).
    "cloth-wind-40": lambda: _cloth_solver(40, 40, wind=(0.05, 0.1, 0.02),
                                           gravity=0.0),
    "cloth-limit-40": lambda: _cloth_solver(40, 40, limits=(0.95, 1.05)),
    "boxes-gs-n3": lambda: _boxes_solver(3, 1),
    "boxes-gs-n6": lambda: _boxes_solver(6, 1),
    "boxes-alpcg-n6": lambda: _boxes_solver(6, 4),
    # Mesh-obstacle contact at scale (ref_driver model 5 geometry): the
    # packed [G,4] SDF (one 8-row gather/query) and the exact grid narrow
    # phase, both through AL-PCG. 20k and the 160k north-star tier.
    "meshobs-sdf-20k": lambda: _meshobs_solver(40, 10, 10, "sdf"),
    "meshobs-exact-20k": lambda: _meshobs_solver(40, 10, 10, "exact"),
    "meshobs-sdf-160k": lambda: _meshobs_solver(80, 20, 20, "sdf"),
    "meshobs-exact-160k": lambda: _meshobs_solver(80, 20, 20, "exact"),
    # North-star tier for the last contact path (~512k tets on the slab).
    "meshobs-sdf-500k": lambda: _meshobs_solver(100, 32, 32, "sdf",
                                                pcg=("jacobi", 100, 1e-4)),
    "meshobs-exact-500k": lambda: _meshobs_solver(100, 32, 32, "exact",
                                                  pcg=("jacobi", 100, 1e-4)),
}

# Ours-label -> reference-label (modes the reference lacks reuse the
# closest reference scene as the denominator).
REF_LABEL = {
    "beam-floor-alpcg-67k": "beam-floor-uzawa-67k",
    "beam-floor-alpcg-67k-fast": "beam-floor-uzawa-67k",
    "beam-floor-alpcg-160k": "beam-floor-uzawa-160k",
    "beam-floor-alpcg-500k": "beam-floor-uzawa-500k",
    "boxes-alpcg-n6": "boxes-gs-n6",
    "meshobs-sdf-20k": "mesh-obstacle-20k",
    "meshobs-exact-20k": "mesh-obstacle-20k",
    "meshobs-sdf-160k": "mesh-obstacle-160k",
    "meshobs-exact-160k": "mesh-obstacle-160k",
    "meshobs-sdf-500k": "mesh-obstacle-500k",
    "meshobs-exact-500k": "mesh-obstacle-500k",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated labels to run")
    args = ap.parse_args()

    here = os.path.dirname(os.path.abspath(__file__))
    ref = {}
    ref_path = os.path.join(here, "BASELINE_MATRIX.json")
    if os.path.exists(ref_path):
        for line in open(ref_path):
            line = line.strip()
            if not line:
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                # e.g. a "checksum": nan from a diverged reference run —
                # skip the line rather than losing the whole matrix.
                print(f"skipping unparseable baseline line: {line[:80]}",
                      file=sys.stderr)
                continue
            ref[d["label"]] = d

    import jax
    import jax.numpy as jnp

    jnp.asarray([1.0]).block_until_ready()
    print(f"handshake ok: {jax.devices()}", file=sys.stderr, flush=True)
    only = set(args.only.split(",")) if args.only else None
    results = []
    for label, build in SCENES.items():
        if only and label not in only:
            continue
        print(f"building {label}...", file=sys.stderr, flush=True)
        solver = build()
        steps = (3 if any(s in label for s in ("160k", "67k", "500k", "160"))
                 else 10)
        time_kw = {}
        if label.startswith("meshobs"):
            # Non-GS contact is frictionless (reference semantics): a
            # resting body slowly slides off the finite slab, so cap the
            # rollout to keep every timed step an in-contact step
            # (CLAUDE.md measurement caveat; same policy as obstacle_lab).
            solver.run(10)
            time_kw = dict(target_s=0.4, max_steps=60)
        dt = _time(solver, steps=steps, **time_kw)
        if label.startswith("meshobs"):
            assert not solver.runtime_data().collision_overflow, \
                f"{label}: near-lane capacity overflowed during timing"
        ours = ADMM_ITERS / dt
        rl = REF_LABEL.get(label, label)
        ref_iters = ref.get(rl, {}).get("admm_iters_per_s")
        row = {"label": label, "n_verts": int(solver._n_verts),
               "ms_per_step": round(dt * 1e3, 2),
               "admm_iters_per_s": round(ours, 1),
               "ref_label": rl,
               "ref_admm_iters_per_s": ref_iters,
               "vs_ref": round(ours / ref_iters, 2) if ref_iters else None}
        results.append(row)
        print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
