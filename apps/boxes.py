"""Two stacked boxes + floor, constrained Gauss-Seidel with dynamic
(inter-mesh) collision (samples/tvcg2017/boxes.cpp)."""

import os
import sys

import jax.numpy as jnp

from _app import parse_cli, run

from admm_elastic_tpu import Floor, Lame, Settings, Solver
from admm_elastic_tpu import binding
from admm_elastic_tpu.geometry.factory import make_xform
from admm_elastic_tpu.geometry.io import load_elenode

DATA = os.environ.get("ADMM_DATA_DIR", "/root/reference/samples/data")


def _load_or(name, fallback):
    """Load reference sample data if present, else a procedural stand-in
    (keeps the demos runnable without the reference checkout)."""
    if os.path.exists(os.path.join(DATA, name + ".node")):
        return load_elenode(os.path.join(DATA, name))
    return fallback()


def main(argv):
    settings = Settings(linsolver=1)
    args = parse_cli(settings, argv)

    solver = Solver()
    surfaces = []
    for i in range(2):
        from admm_elastic_tpu.geometry.factory import make_tet_blocks, make_xform as _xf
        def _box():
            m = make_tet_blocks(8, 8, 8, cell=1.0 / 8)
            m.apply_xform(_xf(trans=(-0.5, -0.5, -0.5)))
            return m
        mesh = _load_or("box768", _box)
        mesh.flags = binding.LINEAR
        mesh.apply_xform(make_xform(trans=(0.0, i * 2.0, 0.0)))
        off = binding.add_tetmesh(solver, mesh, Lame.rubber(), verbose=settings.verbose > 0)
        surfaces.append((off, len(mesh.vertices), mesh.faces))

    solver.add_obstacle(Floor(y=jnp.asarray(-1.0)))
    if not solver.initialize(settings):
        return 1

    traj = run(solver, args, surfaces=surfaces, floor_y=-1.0)
    print(f"min y over run: {traj[:, :, 1].min():.4f} (floor at -1)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
