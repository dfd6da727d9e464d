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
