"""Error-path contract (reference exception conventions, SURVEY §5:
`**Class::fn Error:` messages / construction-time validation).

Each probe mirrors a reference failure mode:
- pin an un-registered vertex after initialize (prefactored modes fix the
  pinnable set at init, src/Solver.cpp:135-156),
- obstacles with the plain LDLT solver (src/Solver.cpp:249-254),
- inverted rest tet (src/TetEnergyTerm.cpp:42-44),
- cloth strain limits not bracketing 1 (src/TriEnergyTerm.cpp:32-33),
- zero-mass vertices (samples/utils/AddMeshes.hpp:109-113),
- non-positive dt auto-corrects to 1/24 s (src/Solver.cpp:175-179).
"""

import numpy as np
import pytest

from admm_elastic_tpu import Lame, Settings, Solver, binding
from admm_elastic_tpu.geometry.factory import make_tet_blocks

VERTS = np.array([[0, 0, 0], [0, 1, 0], [0, 0, 1], [1, 0, 0]], dtype=np.float64)
TET = np.array([[0, 1, 2, 3]])


def test_pin_unknown_vertex_after_initialize_raises():
    s = Solver()
    s.add_nodes(VERTS, np.ones(4))
    s.add_tet_energies(VERTS, TET, Lame.from_youngs_poisson(1e6, 0.3))
    s.set_pins([0])
    assert s.initialize(Settings(verbose=0, linsolver=0))
    with pytest.raises(RuntimeError, match="Constraint.*not found"):
        s.set_pins([2])  # vertex 2 had no pin slot at initialize


def test_obstacle_with_ldlt_raises():
    import jax.numpy as jnp

    from admm_elastic_tpu.collision.passive import Floor

    s = Solver()
    s.add_nodes(VERTS, np.ones(4))
    s.add_tet_energies(VERTS, TET, Lame.from_youngs_poisson(1e6, 0.3))
    s.add_obstacle(Floor(y=jnp.asarray(-1.0)))
    with pytest.raises(RuntimeError, match="No collisions with LDLT"):
        s.initialize(Settings(verbose=0, linsolver=0))


def test_inverted_rest_tet_raises():
    s = Solver()
    s.add_nodes(VERTS, np.ones(4))
    bad = np.array([[0, 2, 1, 3]])  # negative volume ordering
    with pytest.raises(ValueError, match="inverted"):
        s.add_tet_energies(VERTS, bad, Lame.from_youngs_poisson(1e6, 0.3))
        s.initialize(Settings(verbose=0, linsolver=0))


def test_bad_strain_limits_raise():
    lame = Lame.from_youngs_poisson(1e6, 0.3)
    lame.limit_min = 1.2  # must be <= 1
    s = Solver()
    tris = np.array([[0, 1, 2]])
    s.add_nodes(VERTS[:3], np.ones(3))
    with pytest.raises(ValueError, match="limit"):
        s.add_tri_energies(VERTS[:3], tris, lame)
        s.initialize(Settings(verbose=0, linsolver=0))


def test_zero_mass_vertex_raises():
    mesh = make_tet_blocks(1, 1, 1)
    # An extra vertex belonging to no tet lumps zero mass.
    mesh.vertices = np.concatenate([mesh.vertices, [[5.0, 5.0, 5.0]]])
    s = Solver()
    with pytest.raises(RuntimeError, match="Zero mass"):
        binding.add_tetmesh(s, mesh, Lame.rubber(), verbose=False)


def test_bad_dt_autocorrects(capsys):
    s = Solver()
    s.add_nodes(VERTS, np.ones(4))
    s.add_tet_energies(VERTS, TET, Lame.from_youngs_poisson(1e6, 0.3))
    st = Settings(verbose=0, linsolver=0, timestep_s=-1.0)
    assert s.initialize(st)
    assert st.timestep_s == pytest.approx(1.0 / 24.0)
    assert "changing to 1/24s" in capsys.readouterr().out
