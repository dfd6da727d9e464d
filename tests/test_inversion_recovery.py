"""Extreme-inversion robustness on a full organic mesh (bunnyexpand tier,
samples/sca2016/bunnyexpand.cpp; single-tet inversion oracles live in
test_lineartet.py).

Honest accounting throughout: non-finite volumes count as inverted — a
NaN state must never read as "recovered" (the naive (vols<=0).sum() on a
NaN state is 0, which masked a false recovery claim in round 1; the
reference binary itself goes NaN on a full random scramble, measured via
REF_SCRAMBLE=1 benchmarks/ref_driver: 640/640 inverted, finite=0).
"""

import numpy as np

from admm_elastic_tpu import Settings, Solver, binding
from admm_elastic_tpu.geometry.factory import make_tet_bunny_like, make_xform
from admm_elastic_tpu.geometry.mesh import tet_volumes


def _bunny_solver():
    mesh = make_tet_bunny_like(250)  # small bunny-class mesh (CI budget)
    mesh.flags = binding.NOSELFCOLLISION | binding.NEOHOOKEAN
    mesh.apply_xform(make_xform(rot_deg=20.0, rot_axis=(1, 0, 0)))
    solver = Solver()
    binding.add_tetmesh(solver, mesh, verbose=False)
    assert solver.initialize(Settings(verbose=0, admm_iters=10, linsolver=0,
                                      gravity=0.0))
    return solver, mesh


def _bad_count(x, tets):
    vols = tet_volumes(x, tets)
    return int(((vols <= 0) | ~np.isfinite(vols)).sum())


def test_point_collapse_recovers_fully():
    """Collapse every vertex to one point; the NH prox's collapsed-element
    epsilon-inflation + sign rectification must restore the whole mesh
    (src/TetEnergyTerm.cpp:114-136 semantics)."""
    solver, mesh = _bunny_solver()
    solver.x = np.zeros_like(solver.x)
    for _ in range(80):
        solver.step()
    x = solver.x
    assert np.isfinite(x).all()
    assert _bad_count(x, mesh.tets) == 0


def test_point_collapse_recovers_in_f32():
    """f32 regression: the unpinned stored-inverse path was unstable —
    the f32 solve error on the near-rigid modes (A's smallest eigenvalues
    are bare vertex masses) fed the velocity update and grew
    exponentially (NaN by ~step 120). Solver._refine_eff forces one
    iterative-refinement pass for unpinned f32 "inv" systems; recovery
    must now complete and stay finite."""
    mesh = make_tet_bunny_like(250)
    mesh.flags = binding.NOSELFCOLLISION | binding.NEOHOOKEAN
    mesh.apply_xform(make_xform(rot_deg=20.0, rot_axis=(1, 0, 0)))
    solver = Solver()
    binding.add_tetmesh(solver, mesh, verbose=False)
    assert solver.initialize(Settings(verbose=0, admm_iters=10, linsolver=0,
                                      gravity=0.0, dtype=np.float32))
    assert solver._refine_eff >= 1
    solver.x = np.zeros_like(solver.x)
    for _ in range(120):
        solver.step()
    x = solver.x
    assert np.isfinite(x).all(), "f32 point collapse went non-finite"
    # A stray boundary sliver may flicker in f32; the mesh must be
    # essentially restored.
    assert _bad_count(x, mesh.tets) <= 3


def test_random_scramble_stays_finite():
    """Full uniform scramble: a random tangle is globally knotted and no
    local elasticity untangles it — but the state must remain FINITE and
    bounded (the reference binary NaNs on this input)."""
    solver, mesh = _bunny_solver()
    rng = np.random.default_rng(100)
    x0 = solver.x
    lo, hi = x0.min(0), x0.max(0)
    solver.x = rng.uniform(lo, hi, size=x0.shape)
    for _ in range(60):
        solver.step()
    x = solver.x
    assert np.isfinite(x).all(), "scramble blew up to non-finite state"
    assert np.abs(x).max() < 50.0 * np.abs(hi).max()
    # And a meaningful fraction of elements DOES recover.
    assert _bad_count(x, mesh.tets) < 0.75 * len(mesh.tets)
