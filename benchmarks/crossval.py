"""TPU-vs-CPU cross-validation: same f32 program, both backends.

The CPU test suite cannot see TPU-only fusion miscompiles (one zeroed the
floor-contact normals and bodies tunneled, caught only on hardware), so
this sweep runs every solver mode x material x feature combination for a
few steps on the accelerator AND on the host CPU in f32 and compares
trajectories. Agreement is expected to f32-reassociation noise (the TPU
prox path uses the SoA/Pallas kernels while CPU f32 uses the same SoA
math, so divergence beyond ~1e-3 relative on these short stable scenes
indicates a real defect).

Run: python benchmarks/crossval.py  (driver/TPU environment)
"""

import os
import subprocess
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENES = [
    # (name, kwargs) — kwargs may carry steps= (default 8).
    ("beam_linear_ldlt", dict(kind="beam", model="linear", ls=0)),
    ("beam_nh_ldlt", dict(kind="beam", model="neohookean", ls=0)),
    ("beam_stvk_ldlt", dict(kind="beam", model="stvk", ls=0)),
    ("beam_spline_ldlt", dict(kind="beam", model="spline", ls=0)),
    ("beam_nh_pcg", dict(kind="beam", model="neohookean", ls=3)),
    # 1-step variants of the chaotic NH-PCG scenes (VERDICT r3 weak #3):
    # the 8-step trajectories are measurably chaotic (bound 1e-2, see
    # below), which blunts miscompile sensitivity on exactly the newest
    # code paths (flat/ring stencil, circular bands, lane-major CG). One
    # step has no room for Lyapunov growth — measured 1-step backend
    # divergence is ~7e-6, so these run at a tight 1e-4 bound.
    ("beam_nh_pcg_1step", dict(kind="beam", model="neohookean", ls=3,
                               steps=1)),
    ("torus_nh_pcg_1step", dict(kind="torus", model="neohookean", ls=3,
                                steps=1)),
    ("contact_gs", dict(kind="contact", model="linear", ls=1)),
    ("contact_uzawa", dict(kind="contact", model="linear", ls=2)),
    ("contact_alpcg", dict(kind="contact", model="linear", ls=4)),
    ("selfcollision_alpcg", dict(kind="boxes", model="linear", ls=4)),
    ("cloth", dict(kind="cloth", model="linear", ls=0)),
    ("cloth_wind", dict(kind="cloth", model="linear", ls=0, wind=True)),
    ("selfcollision_gs", dict(kind="boxes", model="linear", ls=1)),
    ("sphere_obstacle_gs", dict(kind="sphere", model="linear", ls=1)),
    ("sdf_obstacle_gs", dict(kind="sdf", model="linear", ls=1)),
    # Tier-1 near-lane compaction (r4): near_lanes < n_verts engages the
    # min-corner / candidate-count gate + top_k compaction + scatter-back
    # on the accelerator. Hit semantics are bit-equal to dense by design
    # (test_contact.py proves it on CPU); these scenes prove the compacted
    # program also survives XLA:TPU fusion.
    ("sdf_obstacle_compact_gs", dict(kind="sdf", model="linear", ls=1,
                                     compact=32)),
    ("exactmesh_obstacle_gs", dict(kind="exactmesh", model="linear", ls=1)),
    ("exactmesh_compact_gs", dict(kind="exactmesh", model="linear", ls=1,
                                  compact=32)),
    # Deep-penetration fallback path (r4): a violent drop drives verts
    # beyond the exact grid's capture radius, exercising the lax.cond +
    # top_k compaction + scatter-back fallback on the accelerator.
    ("exactmesh_deep_gs", dict(kind="exactmesh_deep", model="linear", ls=1)),
    ("torus_nh_pcg", dict(kind="torus", model="neohookean", ls=3)),
    # Real reference mesh (r5, VERDICT #6): the reference's own
    # bunny_1124.node/.ele verbatim — an irregular non-lattice tet mesh,
    # so the gather (non-stencil) element path + RCM banding run on a
    # mesh the builder didn't generate. 1-step NH at the tight bound plus
    # an 8-step LDLT trajectory.
    ("bunny_nh_pcg_1step", dict(kind="bunny", model="neohookean", ls=3,
                                steps=1)),
    ("bunny_linear_ldlt", dict(kind="bunny", model="linear", ls=0)),
    # Batched/chunked scale-out path (r5, VERDICT #5): the scale-out
    # number of record runs through make_batched_step +
    # _debloat_for_throughput — a vmap-axis lowering with CPU tests but
    # (pre-r5) zero TPU-vs-CPU trajectory crossvalidation. S=4 scenes,
    # mixed stiffness + gravity, floor contact through AL-PCG.
    ("batched_contact_alpcg", dict(kind="batched", model="linear", ls=4)),
]

STEPS = 8


def run_scene(kind, model, ls, wind=False, steps=STEPS, compact=0):
    import numpy as np
    import jax.numpy as jnp

    from admm_elastic_tpu.ops import prox as prox_ops

    # Force the same SVD/prox implementation on both backends (CPU would
    # otherwise pick the LAPACK path); remaining divergence is pure
    # XLA-reassociation noise, so anything beyond the threshold is a
    # backend miscompile.
    prox_ops.set_svd_impl("jacobi")

    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.collision.passive import Floor
    from admm_elastic_tpu.forces import make_wind_force
    from admm_elastic_tpu.geometry.factory import make_tet_blocks, make_plane, make_xform

    flag = {"linear": binding.LINEAR, "neohookean": binding.NEOHOOKEAN,
            "stvk": binding.STVK, "spline": binding.SPLINE}[model]
    solver = Solver()
    if kind in ("beam", "contact"):
        mesh = make_tet_blocks(6, 3, 3)
        mesh.flags = binding.NOSELFCOLLISION | flag
        binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
        if kind == "beam":
            solver.set_pins(
                [int(i) for i in np.where(mesh.vertices[:, 0] < 1e-9)[0]]
            )
        else:
            solver.add_obstacle(Floor(y=jnp.asarray(-1.0)))
    elif kind == "cloth":
        mesh = make_plane(5, 5, size=2.0)
        binding.add_trimesh(solver, mesh, Lame.soft_rubber(), verbose=False)
        solver.set_pins(
            [int(i) for i in np.where(mesh.vertices[:, 0] < 1e-9)[0]]
        )
        if wind:
            solver.ext_forces.append(
                make_wind_force(mesh.faces, direction=(0.02, 0.05, 0.01))
            )
    elif kind == "sphere":
        from admm_elastic_tpu.collision.passive import Sphere

        mesh = make_tet_blocks(4, 2, 2)
        mesh.flags = binding.NOSELFCOLLISION | flag
        mesh.apply_xform(make_xform(trans=(-2.0, 2.0, -1.0)))
        binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
        solver.add_obstacle(
            Sphere(center=jnp.asarray([0.0, -10.0, 0.0]), rad=jnp.asarray(10.0))
        )
    elif kind == "sdf":
        from admm_elastic_tpu.collision.passive import PassiveMeshSDF

        obs = make_tet_blocks(4, 2, 4, cell=0.5)
        obs.apply_xform(make_xform(trans=(0.0, -1.0, 0.0)))
        sdf = PassiveMeshSDF.from_tet_mesh(obs.vertices, obs.tets, resolution=24,
                                           near_lanes=compact)
        mesh = make_tet_blocks(3, 2, 2, cell=0.4)
        mesh.flags = binding.NOSELFCOLLISION | flag
        mesh.apply_xform(make_xform(trans=(0.4, 1.0, 0.4)))
        binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
        solver.add_obstacle(sdf)
    elif kind in ("exactmesh", "exactmesh_deep"):
        from admm_elastic_tpu.collision.passive import PassiveMeshExact

        deep = kind == "exactmesh_deep"
        obs = make_tet_blocks(4, 2, 4, cell=0.5)
        obs.apply_xform(make_xform(trans=(0.0, -1.0, 0.0)))
        exact = PassiveMeshExact.from_tet_mesh(
            obs.vertices, obs.tets, cells=32 if deep else 16,
            fallback_lanes=256, near_lanes=compact)
        mesh = make_tet_blocks(3, 2, 2, cell=0.4)
        mesh.flags = binding.NOSELFCOLLISION | flag
        mesh.apply_xform(make_xform(
            trans=(0.4, 0.05 if deep else 1.0, 0.4)))
        binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
        solver.add_obstacle(exact)
    elif kind == "torus":
        from admm_elastic_tpu.geometry.factory import make_tet_torus

        mesh = make_tet_torus(n_ring=12, n_sec=4)
        mesh.flags = binding.NOSELFCOLLISION | flag
        binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
        solver.set_pins(list(range((4 + 1) ** 2)))
    elif kind == "boxes":
        for i in range(2):
            m = make_tet_blocks(4, 4, 4, cell=0.25)
            m.flags = binding.LINEAR  # self-collision enabled
            m.apply_xform(make_xform(trans=(0.0, i * 1.1, 0.05 * i)))
            binding.add_tetmesh(solver, m, Lame.rubber(), verbose=False)
        solver.add_obstacle(Floor(y=jnp.asarray(-1.0)))
    elif kind == "bunny":
        from admm_elastic_tpu.geometry.io import load_elenode

        mesh = load_elenode("/root/reference/samples/data/bunny_1124")
        mesh.flags = binding.NOSELFCOLLISION | flag
        binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
        # Pin the bottom band (the feet) and let the body hang.
        ylo = mesh.vertices[:, 1].min()
        solver.set_pins(
            [int(i) for i in np.where(mesh.vertices[:, 1] < ylo + 0.015)[0]])
    elif kind == "batched":
        mesh = make_tet_blocks(6, 3, 3)
        mesh.flags = binding.NOSELFCOLLISION | flag
        binding.add_tetmesh(solver, mesh, Lame.soft_rubber(), verbose=False)
        solver.add_obstacle(Floor(y=jnp.asarray(-1.0)))
    st = Settings(verbose=0, admm_iters=10, linsolver=ls,
                  gravity=(0.0 if wind else -9.8), dtype=np.float32,
                  direct_mode="inv")
    assert solver.initialize(st)
    if kind == "batched":
        from admm_elastic_tpu.parallel.batch import (make_batched_step,
                                                     make_scenario_batch)

        step = make_batched_step(solver, mesh=None, donate=False)
        batch = make_scenario_batch(
            solver, 4, stiffness_scale=np.asarray([0.5, 1.0, 2.0, 4.0]),
            gravity=np.asarray([-9.8, -9.8, -5.0, -15.0]))
        for _ in range(steps):
            batch = step(batch)
        assert not bool(np.asarray(batch.overflow).any())
        return np.asarray(batch.x, np.float64).reshape(-1, 3)
    if kind == "exactmesh_deep":
        # Slam the body into the slab: ~0.29 penetration in the first
        # step (capture radius 0.125 at cells=32) — the fallback regime.
        v0 = np.zeros((solver.x.shape[0], 3), np.float32)
        v0[:, 1] = -7.0
        solver.v = v0
    elif kind in ("sdf", "exactmesh"):
        # Gravity alone reaches the slab only at step ~10; launch the
        # body down so the 8 compared steps include real hits (otherwise
        # these scenes only validate the narrow phase's no-hit masking).
        # Contact lands ~step 6 with ~0.2 first-contact penetration —
        # inside the exact path's 0.27 capture radius at cells=16.
        v0 = np.zeros((solver.x.shape[0], 3), np.float32)
        v0[:, 1] = -2.5
        solver.v = v0
    solver.run(steps)
    return np.asarray(solver.x, np.float64)


def main():
    import argparse

    import numpy as np

    if os.environ.get("CROSSVAL_CHILD"):
        # CPU child: compute one scene, dump to file.
        import jax

        jax.config.update("jax_platforms", "cpu")
        idx = int(os.environ["CROSSVAL_CHILD"]) - 1
        name, kw = SCENES[idx]
        x = run_scene(**kw)
        np.save(os.environ["CROSSVAL_OUT"], x)
        return

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default=None,
                    help="write the per-scene record to this JSON file "
                         "(the committed CROSSVAL_r{N}.json artifact)")
    args = ap.parse_args()

    records = []
    failures = []
    for i, (name, kw) in enumerate(SCENES):
        out = f"/tmp/crossval_{name}.npy"
        env = dict(os.environ, CROSSVAL_CHILD=str(i + 1), CROSSVAL_OUT=out)
        subprocess.run([sys.executable, os.path.abspath(__file__)],
                       check=True, env=env, timeout=560)
        cpu = __import__("numpy").load(out)
        acc = run_scene(**kw)
        scale = max(abs(cpu).max(), 1e-9)
        err = abs(acc - cpu).max() / scale
        # Per-scene bound: the default 2e-3 is ~300x the typical
        # backend-reassociation noise. The NH-PCG scenes are the ones
        # whose f32 trajectories are measurably chaotic: a single benign
        # op-reordering (stencil vs gather D, SAME backend) differs
        # 7.1e-6 after one step and 3.1e-3 after the 8 steps compared
        # here (measured r3, /tmp/stencil_check.py protocol) — Lyapunov
        # amplification ~2x/step. The torus (floppier: pinned at one
        # ring) is the same class: benchmarks/torus_bisect2.py measured
        # every INDIVIDUAL op bit-identical across backends (rel_err
        # 0.0 for Dx/DtW2/apply/apply_T on identical inputs) while the
        # fused step wanders 1.6e-4 (step 1) to ~5e-3 (step 7), and
        # torus_bisect.py showed swapping ANY op ordering (bands<->ELL,
        # stencil<->gather) redraws the outcome between 2e-5 and 4e-3.
        # Their bound is therefore 1e-2: still catches the miscompile
        # class this harness exists for (the fusion bugs found in r1/r2
        # produced O(1) divergence or NaNs), without flagging
        # rounding-profile changes. Miscompile SENSITIVITY on those code
        # paths comes from their *_1step variants: one step has no room
        # for Lyapunov growth (measured ~7e-6), bound 1e-4.
        if name in ("beam_nh_pcg", "torus_nh_pcg"):
            bound = 1e-2
        elif name == "bunny_nh_pcg_1step":
            # Measured floor, NOT a miscompile: benchmarks/bunny_bisect.py
            # (BUNNY_BISECT_r5.json) shows the banded apply_T and A_mv on
            # the bunny operator agree across backends to f32 noise
            # (1.1e-7 / 5.3e-8) while 60 FIXED PCG iterations amplify
            # that to 3.9e-4 and the fused 1-step to 5.96e-4 — the
            # 777-vert irregular mesh's pin-stiffened operator (~1e5
            # diagonal ratios) makes the Krylov iteration itself the
            # amplifier, where the lattice scenes' 1-step floor is 1e-5
            # class. 2e-3 is ~3x the measured floor; the miscompile
            # class this harness catches (O(1) divergence, NaNs) clears
            # it by 3+ orders.
            bound = 2e-3
        elif name == "torus_nh_pcg_1step":
            # The torus's 1-step reassociation floor is higher than the
            # beam's: torus_bisect2 (r3) measured 1.6e-4 after ONE step
            # from a benign same-backend op reordering, and the first
            # r4 on-chip run landed at 1.56e-4 — right on that floor.
            # 1e-3 is ~6x the floor and 10x tighter than the 8-step
            # bound; the miscompile class this harness catches (fusion
            # bugs -> O(1) divergence or NaNs) clears it by >3 orders.
            bound = 1e-3
        elif name.endswith("_1step"):
            bound = 1e-4
        else:
            bound = 2e-3
        ok = bool((err < bound) and __import__("numpy").isfinite(acc).all())
        rec = {"scene": name, "rel_err": float(f"{err:.3e}"),
               "bound": bound, "ok": ok}
        records.append(rec)
        print(json.dumps(rec))
        if not ok:
            failures.append(name)
    verdict = {"crossval": "FAIL" if failures else "PASS",
               "n_scenes": len(SCENES)}
    if failures:
        verdict["scenes"] = failures
    print(json.dumps(verdict))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"scenes": records, **verdict}, f, indent=1)
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
