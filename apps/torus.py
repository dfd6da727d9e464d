"""Torus dropped on a floor, UzawaCG contact (samples/tvcg2017/torus.cpp)."""

import sys

import jax.numpy as jnp

from _app import parse_cli, run

from admm_elastic_tpu import Floor, Lame, Settings, Solver
from admm_elastic_tpu import binding
from admm_elastic_tpu.geometry.factory import make_xform
from admm_elastic_tpu.geometry.demo_data import load_demo_mesh


def main(argv):
    settings = Settings(linsolver=2, admm_iters=10)
    args = parse_cli(settings, argv)

    # Self-contained sample data: generated + cached under <repo>/data;
    # point ADMM_DATA_DIR at the reference's samples/data for the original.
    mesh = load_demo_mesh("torus")
    mesh.flags = binding.LINEAR  # self-collision enabled (no NOSELFCOLLISION)
    mesh.apply_xform(
        make_xform(trans=(0, 2, 0)) @ make_xform(rot_deg=-3.0, rot_axis=(1, 0, 0))
    )

    solver = Solver()
    squishy = Lame.from_youngs_poisson(1000000, 0.1)
    binding.add_tetmesh(solver, mesh, squishy, verbose=settings.verbose > 0)
    solver.add_obstacle(Floor(y=jnp.asarray(-1.0)))
    if not solver.initialize(settings):
        return 1

    traj = run(solver, args, surfaces=[(0, len(mesh.vertices), mesh.faces)], floor_y=-1.0)
    print(f"min y over run: {traj[:, :, 1].min():.4f} (floor at -1)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
