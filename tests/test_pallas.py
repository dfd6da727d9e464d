"""Pallas local-step kernels: interpreter-mode exactness vs the jnp SoA path.

The Pallas kernels share their numerical bodies with ops/soa.py and
ops/hyper_soa.py, so on identical inputs they must agree to within XLA
reassociation noise. The CPU suite runs them in the Pallas interpreter
(set_pallas_mode("interpret")); on real TPU the same code path compiles
via Mosaic.
"""

import numpy as np
import pytest

from admm_elastic_tpu.ops import hyper_soa, pallas_kernels, soa
from admm_elastic_tpu.ops.prox import TET_NEOHOOKEAN, TET_STVK


@pytest.fixture(autouse=True)
def _interpret_mode():
    pallas_kernels.set_pallas_mode("interpret")
    yield
    pallas_kernels.set_pallas_mode("auto")


def _random_f(t, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    # Mix of near-identity, stretched, and inverted deformation gradients.
    f = np.eye(3)[None] + 0.4 * rng.standard_normal((t, 3, 3))
    f[:: 5] *= -1.0  # inverted
    f[1:: 7] *= 3.0  # large stretch
    return f.astype(dtype)


@pytest.mark.parametrize("t", [1, 7, 129, 1500])
def test_linear_prox_matches_soa(t):
    zi = _random_f(t, seed=t)
    got = np.asarray(pallas_kernels.prox_tet_linear_pallas(zi))
    want = np.asarray(soa.prox_tet_linear_soa(zi))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("model", [TET_NEOHOOKEAN, TET_STVK])
def test_hyper_prox_matches_soa(model):
    t = 300
    zi = _random_f(t, seed=3)
    rng = np.random.default_rng(4)
    mu = rng.uniform(1e4, 1e6, t)
    lam = rng.uniform(1e4, 1e6, t)
    kappa = np.zeros(t)
    k = lam + (2.0 / 3.0) * mu
    got = np.asarray(
        pallas_kernels.prox_tet_hyper_pallas(zi, model, mu, lam, kappa, k)
    )
    want = np.asarray(
        hyper_soa.prox_tet_hyper_soa(zi, model, mu, lam, kappa, k)
    )
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_f32_padding_lanes_stay_finite():
    # Padded (dead) lanes are identity matrices; output must be finite and
    # the live lanes unaffected by padding (t chosen to force padding).
    t = 130
    zi = _random_f(t, seed=9, dtype=np.float32)
    mu = np.full(t, 1e5, np.float32)
    lam = np.full(t, 2e5, np.float32)
    kappa = np.zeros(t, np.float32)
    k = lam + (2.0 / 3.0) * mu
    got = np.asarray(
        pallas_kernels.prox_tet_hyper_pallas(zi, TET_NEOHOOKEAN, mu, lam, kappa, k)
    )
    assert got.shape == (t, 3, 3)
    assert np.isfinite(got).all()


def test_fused_local_step_tet_matches_jnp():
    """Fused z+dual-update kernel == prox + manual dual update."""
    import jax.numpy as jnp

    from admm_elastic_tpu.ops import hyper_soa

    t = 200
    rng = np.random.default_rng(11)
    dix = jnp.asarray(rng.standard_normal((9, t)) * 0.3
                      + np.asarray([1, 0, 0, 0, 1, 0, 0, 0, 1])[:, None])
    u = jnp.asarray(rng.standard_normal((9, t)) * 0.05)
    mu = jnp.asarray(rng.uniform(1e4, 1e6, t))
    lam = jnp.asarray(rng.uniform(1e4, 1e6, t))
    kap = jnp.zeros(t)
    k = lam + (2.0 / 3.0) * mu
    z, un = pallas_kernels.local_step_tet_hyper_pallas(
        dix, u, TET_NEOHOOKEAN, mu, lam, kap, k
    )
    v = dix + u
    want = jnp.stack(
        hyper_soa.prox_tet_hyper_tuple(
            tuple(v[i] for i in range(9)), TET_NEOHOOKEAN, mu, lam, kap, k
        ),
        axis=0,
    )
    np.testing.assert_allclose(np.asarray(z), np.asarray(want), atol=1e-10)
    np.testing.assert_allclose(np.asarray(un), np.asarray(v - want), atol=1e-10)


def test_fused_local_step_tri_matches_jnp():
    import jax.numpy as jnp

    from admm_elastic_tpu.ops import soa

    t = 150
    rng = np.random.default_rng(12)
    ident = np.asarray([1.0, 0.0, 0.0, 1.0, 0.0, 0.0])
    dix = jnp.asarray(rng.standard_normal((6, t)) * 0.3 + ident[:, None])
    u = jnp.asarray(rng.standard_normal((6, t)) * 0.05)
    lm = jnp.asarray(np.where(rng.random(t) < 0.5, 0.95, -100.0))
    lx = jnp.asarray(np.where(np.asarray(lm) > 0, 1.05, 100.0))
    z, un = pallas_kernels.local_step_tri_pallas(dix, u, lm, lx)
    v = dix + u
    want = jnp.stack(
        soa.prox_tri_tuple(tuple(v[i] for i in range(6)), lm, lx), axis=0
    )
    np.testing.assert_allclose(np.asarray(z), np.asarray(want), atol=1e-12)
    np.testing.assert_allclose(np.asarray(un), np.asarray(v - want), atol=1e-12)
