"""Soft sphere settling on a floor, constrained Gauss-Seidel
(samples/tvcg2017/signorini.cpp)."""

import sys

import jax.numpy as jnp

from _app import parse_cli, run

from admm_elastic_tpu import Floor, Lame, Settings, Solver
from admm_elastic_tpu import binding
from admm_elastic_tpu.geometry.demo_data import load_demo_mesh


def main(argv):
    # App-local flag (popped before the shared reference-CLI parser):
    # --obstacle floor|sdf|exact swaps the analytic floor for a tet-slab
    # mesh obstacle through either narrow phase (collision/passive.py).
    argv = list(argv)
    obstacle = "floor"
    if "--obstacle" in argv:
        i = argv.index("--obstacle")
        obstacle = argv[i + 1]
        del argv[i : i + 2]

    settings = Settings(linsolver=1)
    args = parse_cli(settings, argv)

    # Self-contained sample data: generated + cached under <repo>/data;
    # point ADMM_DATA_DIR at the reference's samples/data for the original.
    mesh = load_demo_mesh("sphere")
    mesh.flags = binding.NOSELFCOLLISION | binding.LINEAR

    solver = Solver()
    very_soft = Lame.from_youngs_poisson(1000000, 0.299)
    binding.add_tetmesh(solver, mesh, very_soft, verbose=settings.verbose > 0)
    if obstacle == "floor":
        solver.add_obstacle(Floor(y=jnp.asarray(-1.0)))
    else:
        from admm_elastic_tpu import PassiveMeshExact, PassiveMeshSDF
        from admm_elastic_tpu.geometry.factory import make_tet_blocks, make_xform

        ext = mesh.vertices.max(0) - mesh.vertices.min(0)
        slab = make_tet_blocks(12, 2, 12, cell=float(ext.max()) / 3.0)
        sext = slab.vertices.max(0) - slab.vertices.min(0)
        ctr = mesh.vertices.mean(0)
        slab.apply_xform(make_xform(trans=(
            ctr[0] - sext[0] / 2, -1.0 - sext[1], ctr[2] - sext[2] / 2)))
        if obstacle == "sdf":
            solver.add_obstacle(PassiveMeshSDF.from_tet_mesh(
                slab.vertices, slab.tets, resolution=48))
        elif obstacle == "exact":
            solver.add_obstacle(PassiveMeshExact.from_tet_mesh(
                slab.vertices, slab.tets, cells=32))
        else:
            raise SystemExit(f"unknown --obstacle {obstacle!r}")
    if not solver.initialize(settings):
        return 1

    traj = run(solver, args, surfaces=[(0, len(mesh.vertices), mesh.faces)], floor_y=-1.0)
    print(f"min y over run: {traj[:, :, 1].min():.4f} (floor at -1)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
