"""Three material beams stretched by animated pins.

Headless port of the sca2016 beams demo (samples/sca2016/beams.cpp):
LINEAR / NEOHOOKEAN / STVK beams, leftmost/rightmost vertices pinned and
pulled apart 1 m/s via set_pins each frame.
"""

import sys

import numpy as np

from _app import parse_cli, run

from admm_elastic_tpu import Lame, Settings, Solver
from admm_elastic_tpu import binding
from admm_elastic_tpu.geometry.factory import make_tet_blocks, make_xform


def main(argv):
    settings = Settings(admm_iters=20)
    args = parse_cli(settings, argv)

    dim = 3
    flags = [
        binding.NOSELFCOLLISION | binding.LINEAR,
        binding.NOSELFCOLLISION | binding.NEOHOOKEAN,
        binding.NOSELFCOLLISION | binding.STVK,
    ]
    meshes = []
    for i, fl in enumerate(flags):
        m = make_tet_blocks(dim * 4, dim, dim)
        lo, hi = m.bounds()
        m.apply_xform(make_xform(trans=-(lo + hi) / 2.0))
        y = (hi - lo)[1]
        m.apply_xform(make_xform(scale=(1.0 / y,) * 3))  # 1 m tall
        m.apply_xform(make_xform(trans=(0.0, 1.75 - 1.75 * i, 0.0)))
        m.flags = fl
        meshes.append(m)

    solver = Solver()
    soft_rubber = Lame.from_youngs_poisson(10000000, 0.399)
    offsets = [binding.add_tetmesh(solver, m, soft_rubber, verbose=settings.verbose > 0)
               for m in meshes]

    # Find left/right pins (beams.cpp:137-163).
    pins, points, sides = [], [], []
    for m, off in zip(meshes, offsets):
        lo, hi = m.bounds()
        for j, v in enumerate(m.vertices):
            if v[0] < lo[0] + 1e-2:
                pins.append(j + off), points.append(v.copy()), sides.append(-1)
            elif v[0] > hi[0] - 1e-2:
                pins.append(j + off), points.append(v.copy()), sides.append(+1)
    points = np.asarray(points)
    sides = np.asarray(sides, dtype=np.float64)

    solver.set_pins(pins, list(points))
    if not solver.initialize(settings):
        return 1

    state = {"points": points}

    def stretch(frame):
        move = np.array([1.0, 0.0, 0.0]) * solver.m_settings.timestep_s
        state["points"] = state["points"] + sides[:, None] * move[None, :]
        solver.set_pins(pins, list(state["points"]))

    surfaces = [(off, len(m.vertices), m.faces) for m, off in zip(meshes, offsets)]
    run(solver, args, sim_cb=stretch, surfaces=surfaces)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
