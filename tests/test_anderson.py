"""Anderson acceleration: mechanics on a known fixed point + solver safety."""

import numpy as np
import jax.numpy as jnp

from admm_elastic_tpu.solvers import anderson as anderson_mod


def _toy(n=50, seed=0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    b = q @ np.diag(rng.uniform(0.3, 0.95, n)) @ q.T
    c = rng.standard_normal(n)
    x_star = np.linalg.solve(np.eye(n) - b, c)
    return (lambda x: jnp.asarray(c) + jnp.asarray(b) @ x), x_star, n


def test_aa_beats_plain_on_linear_fixed_point():
    g, x_star, n = _toy()
    x = jnp.zeros(n)
    for _ in range(40):
        x = g(x)
    err_plain = float(jnp.linalg.norm(x - x_star))

    x = jnp.zeros(n)
    aa = anderson_mod.init(5, x)
    for _ in range(40):
        gv = g(x)
        x, aa, _ = anderson_mod.update(aa, x, gv, safeguard=1e9)
    err_aa = float(jnp.linalg.norm(x - x_star))
    assert err_aa < 1e-3 * err_plain, (err_aa, err_plain)


def test_aa_safeguard_falls_back_to_plain():
    # A map whose residual the accelerated step would inflate: with
    # safeguard=1.0 every rejected step must reduce to the plain iterate,
    # so AA can never be worse than plain by more than one step.
    g, x_star, n = _toy(seed=3)
    x_plain = jnp.zeros(n)
    x = jnp.zeros(n)
    aa = anderson_mod.init(4, x)
    for _ in range(20):
        x_plain = g(x_plain)
        gv = g(x)
        x, aa, fn = anderson_mod.update(aa, x, gv, safeguard=1.0)
        assert bool(jnp.isfinite(fn))
    # Monotone safeguard: final residual no worse than plain's.
    f_aa = float(jnp.linalg.norm(g(x) - x))
    f_plain = float(jnp.linalg.norm(g(x_plain) - x_plain))
    assert f_aa <= f_plain * 1.5
