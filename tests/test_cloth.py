"""Cloth (triangle) energies, strain limiting, wind (reference M3 scope).

Oracles mirror the trianglestrain demo (samples/sca2016/trianglestrain.cpp)
and the TriEnergyTerm semantics (src/TriEnergyTerm.cpp).
"""

import numpy as np
import jax.numpy as jnp

from admm_elastic_tpu import Lame, Settings, Solver
from admm_elastic_tpu import binding
from admm_elastic_tpu.forces import make_wind_force
from admm_elastic_tpu.geometry.factory import make_plane
from admm_elastic_tpu.ops import prox as prox_ops
from admm_elastic_tpu.ops import reduction as red
from admm_elastic_tpu.system import elements as el

TRI_VERTS = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float64)
TRI = np.array([[0, 1, 2]])


def test_tri_energy_rest_and_rotation():
    lame = Lame(mu=0.0, lam=1.0)
    b = el.build_tri_batch(TRI_VERTS, TRI, lame)
    F = red.tri_Dx(jnp.asarray(TRI_VERTS), b.inds, b.Dlocal)
    assert abs(float(b.energy(F)[0])) < 1e-12

    from tests.test_lineartet import rot_matrix

    R = rot_matrix(72.0, (3, 1, 2))
    F2 = red.tri_Dx(jnp.asarray(TRI_VERTS @ R.T), b.inds, b.Dlocal)
    assert abs(float(b.energy(F2)[0])) < 1e-10

    # Weight invariant w^2 = k * area (src/TriEnergyTerm.cpp:49-50).
    assert abs(float(b.weight[0]) ** 2 - lame.bulk_modulus() * 0.5) < 1e-12


def test_tri_deformation_gradient_stretch():
    lame = Lame(mu=0.0, lam=1.0)
    b = el.build_tri_batch(TRI_VERTS, TRI, lame)
    F = np.asarray(red.tri_Dx(jnp.asarray(TRI_VERTS * 2.0), b.inds, b.Dlocal))[0]
    # Pure in-plane scale: F = 2 * [basis columns] -> column norms == 2.
    np.testing.assert_allclose(np.linalg.norm(F, axis=0), [2.0, 2.0], atol=1e-12)


def test_strain_limit_clamps_columns():
    lame = Lame(mu=0.0, lam=1.0)
    lame.limit_min, lame.limit_max = 0.95, 1.05
    zi = jnp.asarray(np.random.default_rng(0).normal(size=(16, 3, 2)) * 2.0)
    lmin = jnp.full((16,), lame.limit_min)
    lmax = jnp.full((16,), lame.limit_max)
    out = np.asarray(prox_ops.prox_tri(zi, lmin, lmax))
    norms = np.linalg.norm(out, axis=-2)
    assert (norms >= 0.95 - 1e-9).all() and (norms <= 1.05 + 1e-9).all()

    # No limiting when limits are the sentinels.
    out2 = np.asarray(prox_ops.prox_tri(zi, jnp.full((16,), -100.0), jnp.full((16,), 100.0)))
    norms2 = np.linalg.norm(out2, axis=-2)
    assert norms2.max() > 1.05  # untouched by clamping


def test_cloth_drape_strain_limited():
    """Two pinned cloth sheets under gravity; the strain-limited one
    stretches less (trianglestrain.cpp:48-52 scenario, headless)."""
    sags = {}
    for limited in (False, True):
        mesh = make_plane(4, 4)
        mesh.flags = binding.NOSELFCOLLISION | binding.LINEAR
        lame = Lame.from_youngs_poisson(100.0, 0.1)
        if limited:
            lame.limit_min, lame.limit_max = 0.95, 1.05
        solver = Solver()
        binding.add_trimesh(solver, mesh, lame, verbose=False)
        # Pin the two top corners (y = +1).
        x0 = solver.x
        top = np.where(x0[:, 1] > 0.999)[0]
        corners = [int(top[np.argmin(x0[top, 0])]), int(top[np.argmax(x0[top, 0])])]
        solver.set_pins(corners)
        assert solver.initialize(Settings(verbose=0, admm_iters=10, linsolver=0))
        for _ in range(20):
            solver.step()
        x = solver.x
        assert np.isfinite(x).all()
        # Pins held.
        for c in corners:
            assert np.linalg.norm(x[c] - x0[c]) < 1e-4
        sags[limited] = x[:, 1].min()
    # Strain-limited sheet hangs higher (stretches less).
    assert sags[True] > sags[False] + 1e-3, sags


def test_wind_colored_matches_sequential_and_stays_stable():
    """Colored wind = sequential's Gauss-Seidel stability at batched
    speed: on a sheet where the batched (Jacobi) form diverges, colored
    must stay finite and track the sequential (reference-order) result
    to the model's own order-dependence."""
    import jax.numpy as jnp

    from admm_elastic_tpu import Lame, Settings, Solver
    from admm_elastic_tpu.forces import _color_triangles, make_wind_force

    nx = ny = 12
    verts = np.array(
        [[i, 0.0, j] for i in range(nx + 1) for j in range(ny + 1)],
        dtype=np.float64,
    )
    vid = lambda i, j: i * (ny + 1) + j
    tris = []
    for i in range(nx):
        for j in range(ny):
            tris.append([vid(i, j), vid(i + 1, j), vid(i, j + 1)])
            tris.append([vid(i + 1, j), vid(i + 1, j + 1), vid(i, j + 1)])
    tris = np.asarray(tris)

    # Coloring invariant: no two triangles in a color share a vertex.
    ct, cm = _color_triangles(tris)
    for c in range(ct.shape[0]):
        sel = tris[ct[c][cm[c]]]
        flat = sel.reshape(-1)
        assert len(np.unique(flat)) == len(flat), f"color {c} shares vertices"

    def run(mode):
        masses = np.zeros(len(verts))
        for t in tris:
            p = verts[t]
            area = 0.5 * np.linalg.norm(np.cross(p[1] - p[0], p[2] - p[0]))
            masses[t] += 1522.0 * area / 3.0
        s = Solver()
        s.add_nodes(verts, masses)
        s.add_tri_energies(verts, tris, Lame.from_youngs_poisson(1e7, 0.399))
        s.set_pins([int(i) for i in np.where(verts[:, 0] < 1e-9)[0]])
        s.add_explicit_force(make_wind_force(
            tris, direction=(0.05, 0.1, 0.02),
            sequential=(mode == "sequential"), colored=(mode == "colored")))
        assert s.initialize(Settings(verbose=0, admm_iters=5, linsolver=0,
                                     gravity=0.0))
        for _ in range(8):
            s.step()
        return s.x

    seq = run("sequential")
    col = run("colored")
    assert np.isfinite(col).all()
    # The wind model is genuinely order-dependent at O((dt kick)^2);
    # measured deviation ~1e-3 of the sheet span after 8 steps.
    span = np.abs(seq).max()
    assert np.abs(seq - col).max() < 3e-3 * span, np.abs(seq - col).max()


def test_wind_force_direction():
    """Wind pushes a resting sheet along the wind direction
    (src/ExplicitForce.cpp:47-104)."""
    mesh = make_plane(2, 2)  # in xy-plane, normal = +z
    solver = Solver()
    mesh.flags = binding.NOSELFCOLLISION | binding.LINEAR
    binding.add_trimesh(solver, mesh, Lame.from_youngs_poisson(1000.0, 0.1), verbose=False)
    wind = make_wind_force(mesh.faces, direction=(0.0, 0.0, 3.0))
    solver.add_explicit_force(wind)
    solver.set_pins([0])
    assert solver.initialize(Settings(verbose=0, admm_iters=5, gravity=0.0, linsolver=0))
    solver.step()
    # Mean velocity should have positive z (pushed by +z wind).
    assert solver.v[:, 2].mean() > 1e-6
