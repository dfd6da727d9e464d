"""Two pinned cloth sheets, one strain-limited to [0.95, 1.05]
(samples/sca2016/trianglestrain.cpp)."""

import sys

import numpy as np

from _app import parse_cli, run

from admm_elastic_tpu import Lame, Settings, Solver
from admm_elastic_tpu import binding
from admm_elastic_tpu.geometry.factory import make_plane, make_xform


def main(argv):
    settings = Settings()
    args = parse_cli(settings, argv)

    meshes = [make_plane(10, 10), make_plane(10, 10)]
    for m in meshes:
        m.flags = binding.NOSELFCOLLISION | binding.LINEAR
    meshes[0].apply_xform(make_xform(trans=(-2, 0, 0)))
    meshes[1].apply_xform(make_xform(trans=(2, 0, 0)))

    solver = Solver()
    soft = Lame.from_youngs_poisson(100, 0.1)
    off1 = binding.add_trimesh(solver, meshes[1], soft, verbose=settings.verbose > 0)
    limited = Lame.from_youngs_poisson(100, 0.1)
    limited.limit_min, limited.limit_max = 0.95, 1.05
    off0 = binding.add_trimesh(solver, meshes[0], limited, verbose=settings.verbose > 0)

    # Pin the top corners of each sheet.
    pins = []
    for m, off in ((meshes[1], off1), (meshes[0], off0)):
        v = m.vertices
        top = np.where(v[:, 1] > v[:, 1].max() - 1e-6)[0]
        pins.append(int(top[np.argmin(v[top, 0])]) + off)
        pins.append(int(top[np.argmax(v[top, 0])]) + off)
    solver.set_pins(pins)

    if not solver.initialize(settings):
        return 1

    surfaces = [(off1, len(meshes[1].vertices), meshes[1].faces),
                (off0, len(meshes[0].vertices), meshes[0].faces)]
    traj = run(solver, args, surfaces=surfaces)
    print(f"limited sheet min y: {traj[-1][off0:off0+121, 1].min():.4f}, "
          f"free sheet min y: {traj[-1][off1:off1+121, 1].min():.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
