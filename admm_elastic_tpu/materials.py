"""Material parameters: Lame constants and Xu-spline material curves.

Mirrors the reference `admm::Lame` (src/EnergyTerm.hpp:34-59) and the
Valanis-Landel-style separable spline materials of Xu et al. 2015
(src/XuSpline.hpp). Spline evaluation here is pure jnp so it can run inside
batched prox kernels (the reference uses virtual dispatch per element).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass
class Lame:
    """Lame constants with optional hard strain limits.

    Reference: src/EnergyTerm.hpp:34-59. Constructed either from Young's
    modulus k (Pa) + Poisson ratio v, or directly from (mu, lambda).
    """

    mu: float = 0.0
    lam: float = 0.0
    # Hard strain limiting for cloth, [limit_min, limit_max]; defaults mean
    # "no limiting" (reference uses -100/100 sentinels).
    limit_min: float = -100.0
    limit_max: float = 100.0

    @classmethod
    def from_youngs_poisson(cls, k: float, v: float) -> "Lame":
        mu = k / (2.0 * (1.0 + v))
        lam = k * v / ((1.0 + v) * (1.0 - 2.0 * v))
        return cls(mu=mu, lam=lam)

    # Presets (reference: src/EnergyTerm.hpp:37-39)
    @classmethod
    def rubber(cls) -> "Lame":
        return cls.from_youngs_poisson(10000000, 0.499)

    @classmethod
    def soft_rubber(cls) -> "Lame":
        return cls.from_youngs_poisson(10000000, 0.399)

    @classmethod
    def very_soft_rubber(cls) -> "Lame":
        return cls.from_youngs_poisson(1000000, 0.299)

    def bulk_modulus(self) -> float:
        return self.lam + (2.0 / 3.0) * self.mu


# Convenience constructor matching the reference two-arg ctor Lame(k, v).
def lame(k: float, v: float) -> Lame:
    return Lame.from_youngs_poisson(k, v)


# ---------------------------------------------------------------------------
# Xu et al. 2015 spline materials ("Nonlinear Material Design Using Principal
# Stretches"). Energy is separable in principal stretches:
#   Psi(s) = sum_i f(s_i) + sum_{i<j} g(s_i s_j) + h(s1 s2 s3)
# Reference: src/XuSpline.hpp:48-94. Each material provides f,g,h and
# derivatives as jnp-traceable functions of (x, mu, lam, kappa).
# ---------------------------------------------------------------------------

SPLINE_NEOHOOKEAN = 0
SPLINE_STVK = 1
SPLINE_COROTATED = 2


def _compress_term(kappa, x):
    # Eq. 16 stabilizer (src/XuSpline.hpp:44)
    return (kappa / 12.0) * ((1.0 - x) / 6.0) ** 3


def _d_compress_term(kappa, x):
    return (-kappa / 24.0) * ((1.0 - x) / 6.0) ** 2


def spline_fgh(kind: int, x_f, x_g, x_h, mu, lam, kappa):
    """Evaluate (f(x_f), g(x_g), h(x_h)) for the given spline kind.

    kind is static (per element family); values are batched arrays.
    """
    if kind == SPLINE_NEOHOOKEAN:
        f = 0.5 * mu * (x_f * x_f - 1.0)
        g = jnp.zeros_like(x_g)
        logx = jnp.log(x_h)
        h = -mu * logx + 0.5 * lam * logx * logx + _compress_term(kappa, x_h)
    elif kind == SPLINE_STVK:
        x2 = x_f * x_f
        f = 0.125 * lam * (x2 * x2 - 6.0 * x2 + 5.0) + 0.25 * mu * (x2 - 1.0) ** 2
        g = 0.25 * lam * (x_g * x_g - 1.0)
        h = _compress_term(kappa, x_h)
    elif kind == SPLINE_COROTATED:
        f = 0.5 * lam * (x_f * x_f - 6.0 * x_f + 5.0) + mu * (x_f - 1.0) ** 2
        g = lam * (x_g - 1.0)
        h = _compress_term(kappa, x_h)
    else:
        raise ValueError(f"unknown spline kind {kind}")
    return f, g, h


def spline_dfgh(kind: int, x_f, x_g, x_h, mu, lam, kappa):
    """Evaluate (df(x_f), dg(x_g), dh(x_h)) for the given spline kind."""
    if kind == SPLINE_NEOHOOKEAN:
        df = mu * x_f
        dg = jnp.zeros_like(x_g)
        dh = -mu / x_h + lam * jnp.log(x_h) / x_h + _d_compress_term(kappa, x_h)
    elif kind == SPLINE_STVK:
        x2 = x_f * x_f
        df = 0.125 * lam * (4.0 * x2 * x_f - 12.0 * x_f) + mu * x_f * (x2 - 1.0)
        dg = 0.5 * lam * x_g
        dh = _d_compress_term(kappa, x_h)
    elif kind == SPLINE_COROTATED:
        df = 0.5 * lam * (2.0 * x_f - 6.0) + 2.0 * mu * (x_f - 1.0)
        dg = jnp.full_like(x_g, lam)
        dh = _d_compress_term(kappa, x_h)
    else:
        raise ValueError(f"unknown spline kind {kind}")
    return df, dg, dh


def spline_d2fgh(kind: int, x_f, x_g, x_h, mu, lam, kappa):
    """Second derivatives (d2f, d2g, d2h) — used by the batched Newton prox.

    These are analytic derivatives of the reference's df/dg/dh
    (src/XuSpline.hpp:62-92); the reference never needs them because it uses
    L-BFGS, but Newton in principal-stretch space does.
    """
    if kind == SPLINE_NEOHOOKEAN:
        d2f = mu * jnp.ones_like(x_f)
        d2g = jnp.zeros_like(x_g)
        d2h = (mu + lam * (1.0 - jnp.log(x_h))) / (x_h * x_h) + (kappa / 72.0) * ((1.0 - x_h) / 6.0)
    elif kind == SPLINE_STVK:
        x2 = x_f * x_f
        d2f = 0.125 * lam * (12.0 * x2 - 12.0) + mu * (3.0 * x2 - 1.0)
        d2g = 0.5 * lam * jnp.ones_like(x_g)
        d2h = (kappa / 72.0) * ((1.0 - x_h) / 6.0)
    elif kind == SPLINE_COROTATED:
        d2f = (lam + 2.0 * mu) * jnp.ones_like(x_f)
        d2g = jnp.zeros_like(x_g)
        d2h = (kappa / 72.0) * ((1.0 - x_h) / 6.0)
    else:
        raise ValueError(f"unknown spline kind {kind}")
    return d2f, d2g, d2h
