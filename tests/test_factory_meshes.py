"""Procedural tet mesh factories (sphere/torus stand-ins for sample data)."""

import numpy as np

from admm_elastic_tpu.geometry.factory import make_tet_sphere, make_tet_torus
from admm_elastic_tpu.geometry.mesh import (
    surface_faces_from_tets,
    tet_volumes,
)


def test_tet_sphere_valid():
    m = make_tet_sphere(radius=1.0, n=6)
    v = tet_volumes(m.vertices, m.tets)
    assert (v > 1e-9).all(), "degenerate/inverted tets"
    r = np.linalg.norm(m.vertices, axis=1)
    assert r.max() <= 1.0 + 1e-9
    # Total volume within 20% of the ball (max-norm map is approximate).
    assert abs(v.sum() - 4.0 / 3.0 * np.pi) / (4.0 / 3.0 * np.pi) < 0.2
    # Closed surface: every surface edge shared by exactly 2 surface faces.
    faces = surface_faces_from_tets(m.tets)
    edges = np.sort(
        np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]), axis=1
    )
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_tet_torus_valid():
    m = make_tet_torus(major_radius=1.0, minor_radius=0.35, n_ring=24, n_sec=4)
    v = tet_volumes(m.vertices, m.tets)
    assert (v > 1e-9).all()
    # All vertices within the torus bounding annulus.
    rho = np.linalg.norm(m.vertices[:, [0, 2]], axis=1)
    assert rho.min() >= 1.0 - 0.35 - 1e-9 and rho.max() <= 1.0 + 0.35 + 1e-9
    assert np.abs(m.vertices[:, 1]).max() <= 0.35 + 1e-9
    # Volume within 25% of the analytic torus 2 pi^2 R r^2.
    exact = 2.0 * np.pi**2 * 1.0 * 0.35**2
    assert abs(v.sum() - exact) / exact < 0.25
    faces = surface_faces_from_tets(m.tets)
    edges = np.sort(
        np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]), axis=1
    )
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_tet_bunny_like_valid():
    """The procedural bunny-class mesh (demo_data stand-in for
    bunny_1124.node/.ele): unstructured Delaunay of blob-interior points.
    Validity: positive volumes, bunny_1124-class size, deterministic."""
    from admm_elastic_tpu.geometry.factory import make_tet_bunny_like

    m = make_tet_bunny_like(600)
    v = tet_volumes(m.vertices, m.tets)
    assert (v > 0).all()
    assert 400 <= len(m.vertices) <= 800
    assert 2000 <= len(m.tets) <= 6000
    # Non-convex / asymmetric (ears): extent in y exceeds x and z.
    ext = m.vertices.max(0) - m.vertices.min(0)
    assert ext[1] > ext[0] and ext[1] > ext[2]
    # Deterministic generation (cached .node/.ele files must be stable).
    m2 = make_tet_bunny_like(600)
    np.testing.assert_array_equal(m.tets, m2.tets)
    np.testing.assert_allclose(m.vertices, m2.vertices)


def test_reference_bunny_elenode_end_to_end():
    """The reference's own bunny_1124.node/.ele verbatim (VERDICT r5 #6):
    an irregular, non-lattice tet mesh through initialize -> step on both
    the direct (LDLT-equivalent) and PCG global modes. This drives the
    gather (non-stencil) element path and the RCM banding on a mesh the
    builder didn't generate; every other benchmark/parity scene uses
    factory lattices. Asserts: loads with positive volumes, the stencil
    detector correctly declines the irregular topology, pins track
    exactly, trajectories stay finite, and the two global modes agree."""
    import os

    import pytest

    base = "/root/reference/samples/data/bunny_1124"
    if not os.path.exists(base + ".node"):
        pytest.skip("reference sample data not mounted")

    from admm_elastic_tpu import Lame, Settings, Solver, binding
    from admm_elastic_tpu.geometry.io import load_elenode

    mesh = load_elenode(base)
    assert len(mesh.vertices) == 777 and len(mesh.tets) == 2510
    assert tet_volumes(mesh.vertices, mesh.tets).min() > 0

    def run(ls):
        s = Solver()
        m = load_elenode(base)
        m.flags = binding.NOSELFCOLLISION | binding.NEOHOOKEAN
        binding.add_tetmesh(s, m, Lame.soft_rubber(), verbose=False)
        ylo = m.vertices[:, 1].min()
        pins = [int(i) for i in np.where(m.vertices[:, 1] < ylo + 0.015)[0]]
        s.set_pins(pins)
        assert s.initialize(Settings(verbose=0, admm_iters=10, linsolver=ls))
        # Irregular topology: the lattice stencil must NOT engage.
        assert s.system.tets[0].stencil is None
        s.run(5)
        x = np.asarray(s.x)
        assert np.isfinite(x).all()
        np.testing.assert_allclose(
            x[pins], m.vertices[pins], atol=1e-6,
            err_msg="pinned feet drifted")
        # The body hangs: unpinned verts moved, nothing exploded.
        assert 1e-6 < np.abs(x - m.vertices).max() < 0.2
        return x

    x_direct = run(0)
    x_pcg = run(3)
    assert np.abs(x_direct - x_pcg).max() < 5e-4, \
        "direct and PCG disagree on the reference bunny"
