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
