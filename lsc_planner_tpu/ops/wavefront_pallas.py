"""Pallas TPU kernel: batched 6-connected wavefront distance fields.

The XLA version of the grid sweep (ops/grid_search.py) re-reads and
re-writes the whole (N, X, Y, Z) grid from HBM on every min-plus iteration
(~hundreds of iterations x 6 neighbour shifts); this kernel keeps each
agent's grid resident in VMEM for the entire relaxation, so the HBM
traffic collapses to one read + one write per agent.

Layout: grids are passed as (N, Z, Y, X) so the largest extent (X) sits on
the 128-wide lane dimension; Z (the small axis, ~11 cells) lands on the
cheap leading axis instead of wasting lanes.  One grid program per agent;
the relaxation loop runs inside the kernel with an early-exit convergence
check.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9


def _wavefront_kernel(occ_ref, goal_ref, out_ref, *, max_iters: int):
    """One agent's relaxation: occ (1, Z, Y, X) f32 (1=blocked), goal
    (N, 3) int32 in (z, y, x) order (whole array in SMEM -- Mosaic
    rejects sub-8-row SMEM blocks -- indexed by program id) ->
    distances (1, Z, Y, X) f32."""
    _, Z, Y, X = occ_ref.shape
    pid = pl.program_id(0)
    gz = goal_ref[pid, 0]
    gy = goal_ref[pid, 1]
    gx = goal_ref[pid, 2]

    zz = jax.lax.broadcasted_iota(jnp.int32, (Z, Y, X), 0)
    yy = jax.lax.broadcasted_iota(jnp.int32, (Z, Y, X), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (Z, Y, X), 2)
    is_goal = (zz == gz) & (yy == gy) & (xx == gx)

    occ = occ_ref[0]
    blocked = (occ > 0.5) & ~is_goal
    D0 = jnp.where(is_goal, 0.0, BIG)

    at_x0 = xx == 0
    at_x1 = xx == X - 1
    at_y0 = yy == 0
    at_y1 = yy == Y - 1
    at_z0 = zz == 0
    at_z1 = zz == Z - 1

    def relax(D):
        best = D
        # pltpu.roll takes non-negative shifts; roll by size-1 == -1
        r = pltpu.roll(D, X - 1, 2)   # value from x+1
        best = jnp.minimum(best, jnp.where(at_x1, BIG, r) + 1.0)
        r = pltpu.roll(D, 1, 2)       # value from x-1
        best = jnp.minimum(best, jnp.where(at_x0, BIG, r) + 1.0)
        r = pltpu.roll(D, Y - 1, 1)
        best = jnp.minimum(best, jnp.where(at_y1, BIG, r) + 1.0)
        r = pltpu.roll(D, 1, 1)
        best = jnp.minimum(best, jnp.where(at_y0, BIG, r) + 1.0)
        r = pltpu.roll(D, Z - 1, 0)
        best = jnp.minimum(best, jnp.where(at_z1, BIG, r) + 1.0)
        r = pltpu.roll(D, 1, 0)
        best = jnp.minimum(best, jnp.where(at_z0, BIG, r) + 1.0)
        return jnp.where(blocked, BIG, best)

    def cond(state):
        i, D, changed = state
        return (i < max_iters) & changed

    def body(state):
        i, D, _ = state
        # a relaxation step covers one cell per iteration; batching 8
        # steps between convergence checks amortizes the reduction
        D_new = D
        for _ in range(8):
            D_new = relax(D_new)
        changed = jnp.any(D_new < D)
        return (i + 8, D_new, changed)

    _, D, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), D0,
                     jnp.asarray(True)))
    out_ref[0] = D


@partial(jax.jit, static_argnames=("max_iters", "interpret"))
def wavefront_batched(occ_zyx, goal_zyx, max_iters: int = 512,
                      interpret: bool = False):
    """Batched wavefront: occ_zyx (N, Z, Y, X) f32 (1 = blocked),
    goal_zyx (N, 3) int32 (z, y, x) -> D (N, Z, Y, X) f32 with BIG as
    unreachable."""
    N, Z, Y, X = occ_zyx.shape
    # the whole (N, 3) goal table rides in SMEM per grid step; SMEM is a
    # small scalar memory (~1 MB), so cap the agent count well below it
    # (12 bytes/agent: 1024 agents = 12 KB).  If swarms beyond ~64k
    # agents ever need this kernel, chunk the goal table into 8-row
    # blocks indexed by n // 8 instead of loading all N rows.
    if N * 3 * 4 > 768 * 1024:
        raise ValueError(
            f"wavefront goal table for N={N} agents exceeds the SMEM "
            "budget; chunk the goal rows (see comment) or split the batch")
    kernel = partial(_wavefront_kernel, max_iters=max_iters)
    return pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, Z, Y, X), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 3), lambda n: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, Z, Y, X), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Z, Y, X), jnp.float32),
        interpret=interpret,
    )(occ_zyx, goal_zyx)


def wavefront_distance(occ_xyz, goal_xyz, max_iters: int = 512,
                       interpret: bool = False):
    """Convenience wrapper in the planner's (N, X, Y, Z) convention.

    occ_xyz: (N, X, Y, Z) bool; goal_xyz: (N, 3) int32 (x, y, z).
    Returns D (N, X, Y, Z) f32 with jnp.inf for unreachable cells.
    """
    occ_zyx = jnp.transpose(occ_xyz, (0, 3, 2, 1)).astype(jnp.float32)
    goal_zyx = jnp.stack([goal_xyz[:, 2], goal_xyz[:, 1], goal_xyz[:, 0]],
                         axis=-1).astype(jnp.int32)
    D = wavefront_batched(occ_zyx, goal_zyx, max_iters=max_iters,
                          interpret=interpret)
    D = jnp.transpose(D, (0, 3, 2, 1))
    return jnp.where(D >= BIG * 0.5, jnp.inf, D)
