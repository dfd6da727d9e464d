"""Soft sphere settling on a floor, constrained Gauss-Seidel
(samples/tvcg2017/signorini.cpp)."""

import sys

import jax.numpy as jnp

from _app import parse_cli, run

from admm_elastic_tpu import Floor, Lame, Settings, Solver
from admm_elastic_tpu import binding
from admm_elastic_tpu.geometry.demo_data import load_demo_mesh


def main(argv):
    settings = Settings(linsolver=1)
    args = parse_cli(settings, argv)

    # Self-contained sample data: generated + cached under <repo>/data;
    # point ADMM_DATA_DIR at the reference's samples/data for the original.
    mesh = load_demo_mesh("sphere")
    mesh.flags = binding.NOSELFCOLLISION | binding.LINEAR

    solver = Solver()
    very_soft = Lame.from_youngs_poisson(1000000, 0.299)
    binding.add_tetmesh(solver, mesh, very_soft, verbose=settings.verbose > 0)
    solver.add_obstacle(Floor(y=jnp.asarray(-1.0)))
    if not solver.initialize(settings):
        return 1

    traj = run(solver, args, surfaces=[(0, len(mesh.vertices), mesh.faces)], floor_y=-1.0)
    print(f"min y over run: {traj[:, :, 1].min():.4f} (floor at -1)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
