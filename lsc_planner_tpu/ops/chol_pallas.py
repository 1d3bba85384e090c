"""Pallas TPU kernel: batched Cholesky factorization of many tiny SPD
matrices.

The IPM in ops/qp.py factorizes H (B, nv, nv) with nv ~ 39 and B up to the
swarm size every iteration.  XLA's batched Cholesky lowers to a sequential
scalar-ish loop that costs ~4.3 ms at (1024, 39, 39) on a v5e -- ~60% of
the whole planning cycle.  The hardware-shaped layout is the transpose:
put the *batch* on the 128-wide lane dimension and run one textbook
right-looking factorization whose scalar ops are each vectorized over 128
QP instances.  nv static steps of (nv, nv, 128) VPU rank-1 updates stay
entirely in VMEM: ~7.6M VPU ops per tile, speed-of-light ~microseconds.

Matches jnp.linalg.cholesky semantics on the lower triangle (upper
triangle returned as zeros; non-SPD inputs propagate NaNs).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_kernel(h_ref, l_ref, *, n: int):
    """Factor (n, n, Bt): lanes = batch.  Right-looking; after step k the
    Schur update zeroes row/column k exactly (by symmetry), so the working
    matrix stays clean without re-masking."""
    A = h_ref[:]                                   # (n, n, Bt)
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    for k in range(n):
        dk = A[k, k][None, :]                      # (1, Bt)
        inv = 1.0 / jnp.sqrt(dk)
        col = A[:, k, :] * inv                     # (n, Bt)
        # guard against fp asymmetry leaking stale rows above the diagonal
        col = jnp.where(ri >= k, col, 0.0)
        l_ref[:, k, :] = col
        A = A - col[:, None, :] * col[None, :, :]


@partial(jax.jit, static_argnames=("interpret", "block_b"))
def cholesky_batched(H, interpret: bool = False, block_b: int = 128):
    """Batched lower Cholesky of H (B, n, n) f32, batch-in-lanes layout.

    Drop-in for jnp.linalg.cholesky on stacks of small SPD matrices.
    """
    B, n, _ = H.shape
    Bp = max(((B + block_b - 1) // block_b) * block_b, block_b)
    Ht = jnp.transpose(H, (1, 2, 0))               # (n, n, B)
    if Bp != B:
        # pad with identity so padded lanes factor cleanly (no NaNs)
        pad = jnp.broadcast_to(jnp.eye(n, dtype=H.dtype)[:, :, None],
                               (n, n, Bp - B))
        Ht = jnp.concatenate([Ht, pad], axis=-1)
    Lt = pl.pallas_call(
        partial(_chol_kernel, n=n),
        grid=(Bp // block_b,),
        in_specs=[pl.BlockSpec((n, n, block_b), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, n, block_b), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n, Bp), H.dtype),
        interpret=interpret,
    )(Ht)
    return jnp.transpose(Lt[:, :, :B], (2, 0, 1))


# ---------------------------------------------------------------------------
# Fused factor + substitution kernels, batch-in-lanes end to end.
#
# The IPM calls one factorization and two KKT solves (4 triangular
# substitutions) per iteration.  XLA's batched triangular_solve on (B, 39,
# 39) lowers to a sequential scalar loop just like its Cholesky, so round-
# tripping the Pallas factor through (B, n, n) layout for XLA substitutions
# gives the dominant cost right back.  Instead the factor STAYS in the
# (n, n, Bp) lanes layout (an opaque handle to the caller) and the
# substitutions run in the same layout: each of the n forward/backward
# steps is one (n, Bt) VPU select/FMA over 128 QP instances, so a full
# solve is ~2*n^2*Bt vector ops -- microseconds, entirely in VMEM.
# ---------------------------------------------------------------------------


def _fsub(L, rhs, n):
    """Forward substitution L z = rhs in lanes layout; L (n,n,Bt),
    rhs (n, Bt).  Fully vectorized over lanes; n unrolled steps."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    z = rhs
    for k in range(n):
        zk = z[k] / L[k, k]                        # (Bt,)
        upd = z - L[:, k, :] * zk[None, :]
        z = jnp.where(ri == k, zk[None, :], jnp.where(ri > k, upd, z))
    return z


def _bsub(L, rhs, n):
    """Backward substitution L^T x = rhs in lanes layout (uses columns of
    L as rows of L^T)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    x = rhs
    for k in range(n - 1, -1, -1):
        xk = x[k] / L[k, k]
        upd = x - L[k, :, :] * xk[None, :]         # L^T[:, k] = L[k, :]
        x = jnp.where(ri == k, xk[None, :], jnp.where(ri < k, upd, x))
    return x


def _factor_solve_kernel(h_ref, r_ref, l_ref, x_ref, *, n: int):
    """Factor H and solve (L L^T) x = rhs in one VMEM pass."""
    A = h_ref[:]
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    for k in range(n):
        dk = A[k, k][None, :]
        inv = 1.0 / jnp.sqrt(dk)
        col = A[:, k, :] * inv
        col = jnp.where(ri >= k, col, 0.0)
        l_ref[:, k, :] = col
        A = A - col[:, None, :] * col[None, :, :]
    L = l_ref[:]
    x_ref[:] = _bsub(L, _fsub(L, r_ref[:], n), n)


def _resolve_kernel(l_ref, r_ref, x_ref, *, n: int):
    L = l_ref[:]
    x_ref[:] = _bsub(L, _fsub(L, r_ref[:], n), n)


def _pad_lanes(Ht, rt, n, B, Bp, dtype):
    if Bp == B:
        return Ht, rt
    pad = jnp.broadcast_to(jnp.eye(n, dtype=dtype)[:, :, None],
                           (n, n, Bp - B))
    Ht = jnp.concatenate([Ht, pad], axis=-1)
    rt = jnp.concatenate([rt, jnp.zeros((n, Bp - B), dtype)], axis=-1)
    return Ht, rt


@partial(jax.jit, static_argnames=("interpret", "block_b"))
def chol_factor_solve(H, rhs, interpret: bool = False, block_b: int = 128):
    """Factor H (B, n, n) and solve H x = rhs (B, n) in one fused kernel.

    Returns (L_lanes, x) where L_lanes (n, n, Bp) is the opaque lanes-
    layout factor for `chol_resolve` and x is (B, n).
    """
    B, n, _ = H.shape
    Bp = max(((B + block_b - 1) // block_b) * block_b, block_b)
    Ht = jnp.transpose(H, (1, 2, 0))
    rt = jnp.transpose(rhs, (1, 0))
    Ht, rt = _pad_lanes(Ht, rt, n, B, Bp, H.dtype)
    L, xt = pl.pallas_call(
        partial(_factor_solve_kernel, n=n),
        grid=(Bp // block_b,),
        in_specs=[pl.BlockSpec((n, n, block_b), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((n, block_b), lambda b: (0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((n, n, block_b), lambda b: (0, 0, b),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((n, block_b), lambda b: (0, b),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n, n, Bp), H.dtype),
                   jax.ShapeDtypeStruct((n, Bp), H.dtype)),
        interpret=interpret,
    )(Ht, rt)
    return L, jnp.transpose(xt[:, :B], (1, 0))


@partial(jax.jit, static_argnames=("interpret", "block_b"))
def chol_resolve(L_lanes, rhs, interpret: bool = False, block_b: int = 128):
    """Solve (L L^T) x = rhs (B, n) with a lanes-layout factor from
    `chol_factor_solve`."""
    n, _, Bp = L_lanes.shape
    B = rhs.shape[0]
    rt = jnp.transpose(rhs, (1, 0))
    if Bp != B:
        rt = jnp.concatenate([rt, jnp.zeros((n, Bp - B), rhs.dtype)],
                             axis=-1)
    xt = pl.pallas_call(
        partial(_resolve_kernel, n=n),
        grid=(Bp // block_b,),
        in_specs=[pl.BlockSpec((n, n, block_b), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((n, block_b), lambda b: (0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, block_b), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, Bp), L_lanes.dtype),
        interpret=interpret,
    )(L_lanes, rt)
    return jnp.transpose(xt[:, :B], (1, 0))
