"""Oracles for the batched signed SVD kernels (ops/svd3.py)."""

import numpy as np
import jax.numpy as jnp

from admm_elastic_tpu.ops.svd3 import (
    polar_rotation_3x2,
    signed_svd3,
    signed_svd3_jacobi,
    svd_3x2,
)


def random_batch(rng, n=64):
    F = rng.normal(size=(n, 3, 3))
    # Mix in near-degenerate and inverted cases.
    F[0] = 0.0
    F[1] = np.diag([1.0, 1.0, -1.0])
    F[2] = np.diag([1e-9, 1.0, 1.0])
    F[3] = np.eye(3)
    F[4] = -np.eye(3)
    return F


def check_signed(F, U, S, V, tol):
    U, S, V = np.asarray(U), np.asarray(S), np.asarray(V)
    recon = np.einsum("bij,bj,bkj->bik", U, S, V)
    assert np.abs(recon - F).max() < tol, np.abs(recon - F).max()
    assert (np.linalg.det(U) > 0.99).all()
    assert (np.linalg.det(V) > 0.99).all()
    # Orthonormality
    assert np.abs(np.einsum("bij,bik->bjk", U, U) - np.eye(3)).max() < tol
    assert np.abs(np.einsum("bij,bik->bjk", V, V) - np.eye(3)).max() < tol
    # Inversion convention: sign(S2) == sign(det F) (0-dets excluded)
    detF = np.linalg.det(F)
    nz = np.abs(detF) > 1e-8
    assert (np.sign(S[nz, 2]) == np.sign(detF[nz])).all()
    # Ordering: S0 >= S1 >= |S2|
    assert (S[:, 0] >= S[:, 1] - 1e-9).all()
    assert (S[:, 1] >= np.abs(S[:, 2]) - 1e-9).all()


def test_signed_svd3():
    F = random_batch(np.random.default_rng(0))
    U, S, V = signed_svd3(jnp.asarray(F))
    check_signed(F, U, S, V, 1e-10)


def test_signed_svd3_jacobi_matches():
    F = random_batch(np.random.default_rng(1))
    U, S, V = signed_svd3_jacobi(jnp.asarray(F), sweeps=8)
    check_signed(F, U, S, V, 1e-8)
    # Singular values match LAPACK's.
    _, S_ref, _ = signed_svd3(jnp.asarray(F))
    assert np.abs(np.abs(np.asarray(S)) - np.abs(np.asarray(S_ref))).max() < 1e-8


def test_svd_3x2_and_polar():
    rng = np.random.default_rng(2)
    F = rng.normal(size=(32, 3, 2))
    F[0] = 0.0
    U, S, V = svd_3x2(jnp.asarray(F))
    recon = np.einsum("bij,bj,bkj->bik", np.asarray(U), np.asarray(S), np.asarray(V))
    assert np.abs(recon - F).max() < 1e-10

    # polar_rotation_3x2 == U @ V^T from the thin SVD (S -> identity).
    P_ref = np.einsum("bij,bkj->bik", np.asarray(U), np.asarray(V))
    P = np.asarray(polar_rotation_3x2(jnp.asarray(F)))
    nz = np.abs(np.linalg.det(np.einsum("bji,bjk->bik", F, F))) > 1e-12
    assert np.abs(P[nz] - P_ref[nz]).max() < 1e-8
    # Columns orthonormal even in degenerate cases.
    G = np.einsum("bji,bjk->bik", P, P)
    assert np.abs(G - np.eye(2)).max() < 1e-8
