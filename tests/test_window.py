"""Windowed gather plans for irregular-mesh D/D^T (host planner)."""

import numpy as np

from admm_elastic_tpu.geometry.factory import make_tet_torus
from admm_elastic_tpu.ops import window


def test_plan_windows_torus_and_oracle():
    mesh = make_tet_torus(n_ring=24, n_sec=6)
    inds = np.asarray(mesh.tets)
    n = len(mesh.vertices)
    plan = window.plan_windows(inds, n, rows_per_tile=256, w2=8)
    assert plan is not None
    assert plan.w % 64 == 0 and plan.w <= 4096
    assert (plan.local >= 0).all() and (plan.local < plan.w).all()
    assert (plan.starts % 8 == 0).all()
    assert plan.starts.max() + plan.w <= plan.n_pad
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, 3))
    got = window.gather_ref(plan, inds, x)
    want = x[inds[plan.order].reshape(-1)]
    np.testing.assert_array_equal(got[: want.shape[0]], want)


def test_plan_windows_rejects_scrambled():
    rng = np.random.default_rng(1)
    n = 4096
    inds = rng.integers(0, n, size=(2000, 4))
    plan = window.plan_windows(inds, n, rows_per_tile=256, max_window=512)
    assert plan is None


def test_plan_windows_pad_rows_do_not_widen():
    # 5 elements of arity 4 = 20 rows; tile of 16 -> 2 tiles, 12 pad rows.
    inds = np.array([[0, 1, 2, 3]] * 5)
    plan = window.plan_windows(inds, 10, rows_per_tile=16, w2=8)
    assert plan is not None
    assert plan.n_tiles == 2
    assert plan.w == 64  # one unit, not widened by padding
