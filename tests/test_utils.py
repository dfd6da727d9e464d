"""Checkpoint/resume and convergence-logging utilities."""

import numpy as np

from admm_elastic_tpu import Lame, Settings, Solver
from admm_elastic_tpu.utils.checkpoint import load_state, save_state
from admm_elastic_tpu.utils.logging import admm_error_trace

VERTS = np.array([[0, 0, 0], [0, 1, 0], [0, 0, 1], [1, 0, 0]], dtype=np.float64)
TET = np.array([[0, 1, 2, 3]])


def _solver(**kw):
    s = Solver()
    s.add_nodes(VERTS, np.ones(4))
    s.add_tet_energies(VERTS, TET, Lame.from_youngs_poisson(5e5, 0.25))
    s.set_pins([0])
    assert s.initialize(Settings(verbose=0, admm_iters=10, **kw))
    return s


def test_checkpoint_roundtrip(tmp_path):
    s = _solver()
    for _ in range(3):
        s.step()
    path = str(tmp_path / "ck.npz")
    save_state(path, s.state)
    x3 = s.x.copy()

    s.step()  # diverge

    s.state = load_state(path)
    np.testing.assert_array_equal(s.x, x3)
    s.step()
    x4a = s.x.copy()

    # Re-run the same step from the checkpoint: bitwise deterministic.
    s.state = load_state(path)
    s.step()
    np.testing.assert_array_equal(s.x, x4a)


def test_admm_error_trace_decreases():
    # Known-solution re-run workflow (reference SolverLog, src/SolverLog.hpp).
    s = _solver()
    xx = s.x
    xx[3] = [5.0, 0.0, 0.0]
    s.x = xx
    state0 = s.state

    # Ground truth: many iterations.
    s.m_settings.admm_iters = 200
    s.step()
    x_star = s.x.copy()

    s.state = state0
    s.m_settings.admm_iters = 15
    errors = admm_error_trace(s, x_star)
    assert len(errors) == 15
    assert errors[-1] < errors[0]
    assert errors[-1] < 0.2
