"""Pallas TPU kernels for the ADMM local-step hot ops.

The local step (the reference's OpenMP element loop, src/Solver.cpp:84-87)
is, per tetrahedron: deformation gradient -> signed 3x3 SVD -> projected
Newton in principal-stretch space -> recompose. As plain jnp this is a very
long elementwise chain that XLA splits into several fusions, each spilling
its intermediates to HBM. These kernels run the *entire* chain in one
pallas_call: one HBM read of z (9 floats/elt) + params, one HBM write of
the prox output — everything in between lives in VMEM/vector registers.

Data layout: struct-of-arrays. A [T, 3, 3] tensor tiles its last two dims
onto the (8 sublane, 128 lane) registers with ~1% packing; here the matrix
entries are rows of a [9, T] array so the element axis fills the lanes.
The numerical bodies are shared verbatim with the jnp SoA path
(ops/soa.py, ops/hyper_soa.py — pure elementwise jnp, legal inside a
Pallas kernel), so the Pallas path is bit-identical to the fallback by
construction (modulo XLA reassociation).

Mode switch: set_pallas_mode("auto" | "on" | "off" | "interpret").
"auto" enables the kernels on TPU for fp32/bf16; "interpret" runs them in
the Pallas interpreter (used by the CPU test suite for exactness checks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from admm_elastic_tpu.ops import hyper_soa, soa

_PALLAS_MODE = "auto"

# Lane-block size per grid step. 1024 fp32 lanes * (16-sublane padded 9-row
# input + output + params + Newton temporaries) stays well under the
# ~16 MB/core VMEM budget while giving the VPU long vectors.
_BLOCK_T = 1024


def set_pallas_mode(mode: str) -> None:
    """'auto' (TPU only), 'on', 'off', or 'interpret' (debug/CPU tests)."""
    global _PALLAS_MODE
    if mode not in ("auto", "on", "off", "interpret"):
        raise ValueError(f"bad pallas mode {mode!r}")
    _PALLAS_MODE = mode


def pallas_enabled(dtype) -> bool:
    """Trace-time predicate: use the Pallas kernels for this dtype?"""
    if _PALLAS_MODE == "off":
        return False
    if _PALLAS_MODE in ("on", "interpret"):
        return True
    return jax.default_backend() == "tpu" and jnp.dtype(dtype) in (
        jnp.dtype(jnp.float32),
        jnp.dtype(jnp.bfloat16),
    )


def _interpret() -> bool:
    return _PALLAS_MODE == "interpret"


def _pad_t(n: int) -> int:
    if n <= 128:
        return 128
    if n <= _BLOCK_T:
        return ((n + 127) // 128) * 128
    return ((n + _BLOCK_T - 1) // _BLOCK_T) * _BLOCK_T


def _to_rows(zi, pad_t: int):
    """[T, 3, 3] -> [9, pad_t] row-major SoA; padding is identity matrices.

    Identity padding keeps the hyperelastic body well-defined in the dead
    lanes (J=1, log J=0) so no NaN/Inf contaminates reductions or slows the
    VPU with denormals.
    """
    t = zi.shape[0]
    rows = zi.reshape(t, 9).T  # [9, T]
    eye = jnp.asarray([1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0], zi.dtype)
    out = jnp.broadcast_to(eye[:, None], (9, pad_t))
    return jax.lax.dynamic_update_slice(out, rows, (0, 0))


def _pad_param(p, pad_t: int, fill: float = 1.0):
    t = p.shape[0]
    out = jnp.full((pad_t,), fill, p.dtype)
    return jax.lax.dynamic_update_slice(out, p, (0,))[None, :]  # [1, pad_t]


def _from_rows(rows, t: int):
    """[9, pad_t] -> [T, 3, 3]."""
    return rows[:, :t].T.reshape(t, 3, 3)


def _read9(ref):
    return tuple(ref[r : r + 1, :] for r in range(9))


def _write9(ref, vals):
    for r in range(9):
        ref[r : r + 1, :] = vals[r]


# --- hyperelastic tet prox ----------------------------------------------------


def _hyper_kernel(model, n_iters, sweeps, z_ref, p_ref, o_ref):
    f = _read9(z_ref)
    mu = p_ref[0:1, :]
    lam = p_ref[1:2, :]
    kappa = p_ref[2:3, :]
    k = p_ref[3:4, :]
    out = hyper_soa.prox_tet_hyper_tuple(
        f, model, mu, lam, kappa, k, n_iters=n_iters, sweeps=sweeps
    )
    _write9(o_ref, out)


@functools.partial(
    jax.jit, static_argnames=("model", "n_iters", "sweeps", "interpret")
)
def _prox_hyper_call(zi, mu, lam, kappa, k, model, n_iters, sweeps, interpret):
    t = zi.shape[0]
    pad_t = _pad_t(t)
    bt = min(_BLOCK_T, pad_t)
    rows = _to_rows(zi, pad_t)
    params = jnp.concatenate(
        [
            _pad_param(mu, pad_t),
            _pad_param(lam, pad_t),
            _pad_param(kappa, pad_t, fill=0.0),
            _pad_param(jnp.broadcast_to(k, (t,)), pad_t),
        ],
        axis=0,
    )  # [4, pad_t]
    out = pl.pallas_call(
        functools.partial(_hyper_kernel, model, n_iters, sweeps),
        grid=(pad_t // bt,),
        in_specs=[
            pl.BlockSpec((9, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, pad_t), zi.dtype),
        interpret=interpret,
    )(rows, params)
    return _from_rows(out, t)


def prox_tet_hyper_pallas(zi, model: str, mu, lam, kappa, k,
                          n_iters: int = 8, sweeps: int = 8):
    """Fused [T,3,3] hyperelastic prox (signed SVD + projected Newton)."""
    return _prox_hyper_call(
        zi, mu, lam, kappa, k, model, n_iters, sweeps, _interpret()
    )


# --- fused rows-native local step ----------------------------------------------
#
# With z/u carried in SoA rows layout [9, T] end-to-end (system.local_step),
# the whole ADMM local step for a tet family is ONE kernel with NO
# transposes: inputs Dx rows + u rows, outputs z rows and the updated dual
# u' = u + Dx - z. (zi = prox(Dix + ui); ui += Dix - zi,
# src/EnergyTerm.hpp:130-140.)


def _local_hyper_kernel(model, n_iters, sweeps, dix_ref, u_ref, p_ref,
                        z_ref, uo_ref):
    dix = _read9(dix_ref)
    u = _read9(u_ref)
    v = tuple(d + uu for d, uu in zip(dix, u))
    mu = p_ref[0:1, :]
    lam = p_ref[1:2, :]
    kappa = p_ref[2:3, :]
    k = p_ref[3:4, :]
    z = hyper_soa.prox_tet_hyper_tuple(
        v, model, mu, lam, kappa, k, n_iters=n_iters, sweeps=sweeps
    )
    _write9(z_ref, z)
    _write9(uo_ref, tuple(vv - zz for vv, zz in zip(v, z)))


def _pad_rows(rows, pad_t: int, identity: bool):
    t = rows.shape[1]
    if identity:
        eye = jnp.asarray(
            [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0], rows.dtype
        )
        out = jnp.broadcast_to(eye[:, None], (9, pad_t))
    else:
        out = jnp.zeros((9, pad_t), rows.dtype)
    return jax.lax.dynamic_update_slice(out, rows, (0, 0))


@functools.partial(
    jax.jit, static_argnames=("model", "n_iters", "sweeps", "interpret")
)
def _local_hyper_call(dix, u, mu, lam, kappa, k, model, n_iters, sweeps,
                      interpret):
    t = dix.shape[1]
    pad_t = _pad_t(t)
    bt = min(_BLOCK_T, pad_t)
    dix_p = _pad_rows(dix, pad_t, identity=True)
    u_p = _pad_rows(u, pad_t, identity=False)
    params = jnp.concatenate(
        [
            _pad_param(mu, pad_t),
            _pad_param(lam, pad_t),
            _pad_param(kappa, pad_t, fill=0.0),
            _pad_param(jnp.broadcast_to(k, (t,)), pad_t),
        ],
        axis=0,
    )
    spec9 = pl.BlockSpec((9, bt), lambda i: (0, i), memory_space=pltpu.VMEM)
    z, uo = pl.pallas_call(
        functools.partial(_local_hyper_kernel, model, n_iters, sweeps),
        grid=(pad_t // bt,),
        in_specs=[
            spec9,
            spec9,
            pl.BlockSpec((4, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(spec9, spec9),
        out_shape=(
            jax.ShapeDtypeStruct((9, pad_t), dix.dtype),
            jax.ShapeDtypeStruct((9, pad_t), dix.dtype),
        ),
        interpret=interpret,
    )(dix_p, u_p, params)
    return z[:, :t], uo[:, :t]


def local_step_tet_hyper_pallas(dix_rows, u_rows, model: str, mu, lam, kappa,
                                k, n_iters: int = 8, sweeps: int = 8):
    """Fused tet local step on rows layout: (z_rows, u_new_rows)."""
    return _local_hyper_call(
        dix_rows, u_rows, mu, lam, kappa, k, model, n_iters, sweeps,
        _interpret(),
    )


# --- fused rows-native cloth local step ------------------------------------------


def _read6(ref):
    return tuple(ref[r : r + 1, :] for r in range(6))


def _local_tri_kernel(dix_ref, u_ref, p_ref, z_ref, uo_ref):
    dix = _read6(dix_ref)
    u = _read6(u_ref)
    v = tuple(d + uu for d, uu in zip(dix, u))
    z = soa.prox_tri_tuple(v, p_ref[0:1, :], p_ref[1:2, :])
    for r in range(6):
        z_ref[r : r + 1, :] = z[r]
        uo_ref[r : r + 1, :] = v[r] - z[r]


def _pad_rows6(rows, pad_t: int, identity: bool):
    if identity:
        ident = jnp.asarray([1.0, 0.0, 0.0, 1.0, 0.0, 0.0], rows.dtype)
        out = jnp.broadcast_to(ident[:, None], (6, pad_t))
    else:
        out = jnp.zeros((6, pad_t), rows.dtype)
    return jax.lax.dynamic_update_slice(out, rows, (0, 0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _local_tri_call(dix, u, limit_min, limit_max, interpret):
    t = dix.shape[1]
    pad_t = _pad_t(t)
    bt = min(_BLOCK_T, pad_t)
    dix_p = _pad_rows6(dix, pad_t, identity=True)
    u_p = _pad_rows6(u, pad_t, identity=False)
    params = jnp.concatenate(
        [_pad_param(limit_min, pad_t, fill=-100.0),
         _pad_param(limit_max, pad_t, fill=100.0)],
        axis=0,
    )
    spec6 = pl.BlockSpec((6, bt), lambda i: (0, i), memory_space=pltpu.VMEM)
    z, uo = pl.pallas_call(
        _local_tri_kernel,
        grid=(pad_t // bt,),
        in_specs=[
            spec6,
            spec6,
            pl.BlockSpec((2, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(spec6, spec6),
        out_shape=(
            jax.ShapeDtypeStruct((6, pad_t), dix.dtype),
            jax.ShapeDtypeStruct((6, pad_t), dix.dtype),
        ),
        interpret=interpret,
    )(dix_p, u_p, params)
    return z[:, :t], uo[:, :t]


def local_step_tri_pallas(dix_rows, u_rows, limit_min, limit_max):
    """Fused cloth local step on rows layout [6, T]: (z_rows, u_new_rows)."""
    return _local_tri_call(dix_rows, u_rows, limit_min, limit_max, _interpret())


# --- linear tet prox -----------------------------------------------------------


def _linear_kernel(sweeps, z_ref, o_ref):
    _write9(o_ref, soa.prox_tet_linear_tuple(_read9(z_ref), sweeps=sweeps))


@functools.partial(jax.jit, static_argnames=("sweeps", "interpret"))
def _prox_linear_call(zi, sweeps, interpret):
    t = zi.shape[0]
    pad_t = _pad_t(t)
    bt = min(_BLOCK_T, pad_t)
    rows = _to_rows(zi, pad_t)
    out = pl.pallas_call(
        functools.partial(_linear_kernel, sweeps),
        grid=(pad_t // bt,),
        in_specs=[pl.BlockSpec((9, bt), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((9, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, pad_t), zi.dtype),
        interpret=interpret,
    )(rows)
    return _from_rows(out, t)


def prox_tet_linear_pallas(zi, sweeps: int = 8):
    """Fused [T,3,3] linear-tet prox (signed SVD + rotation projection)."""
    return _prox_linear_call(zi, sweeps, _interpret())
