"""Safe Flight Corridor construction: axis-aligned box expansion on device.

Re-designs CorridorConstructor (include/corridor_constructor.hpp): the
reference expands a seed box one voxel-face at a time, rescanning the whole
box volume against the EDT per step (O(volume) per check).  Here every
check is an O(1) summed-area-table count (world/esdf.py), the expansion is
a lax.while round-robin over the six faces, and the whole swarm expands
its boxes in one vmap.
"""
from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from ..config import SP_EPSILON, SP_EPSILON_FLOAT
from .esdf import ESDF, OccupancySAT


@dataclasses.dataclass
class CorridorBuilder:
    esdf: ESDF
    world_min: np.ndarray
    world_max: np.ndarray
    agent_radius: float           # one SAT per distinct radius
    dtype: object = jnp.float32

    def __post_init__(self):
        self.sat = OccupancySAT.build(self.esdf, self.agent_radius)
        # zero-margin table: RAW occupancy (cells whose center sits on an
        # obstacle), used to vet trapped-seed box extensions -- space
        # inside the agent-radius margin but outside actual obstacles is
        # acceptable recovery space, physical obstacle interior is not
        self.sat_raw = OccupancySAT.build(self.esdf, 0.0)
        res = self.esdf.resolution
        self._wmin = np.asarray(self.world_min, np.float64)
        self._wmax = np.asarray(self.world_max, np.float64)
        # voxel-corner index bounds of the world box
        self._cmin = jnp.asarray(
            np.round(self._wmin / res).astype(np.int32))
        self._cmax = jnp.asarray(
            np.round(self._wmax / res).astype(np.int32))

    # ------------------------------------------------------------------
    def initial_box(self, point):
        """Seed lattice box around a point (expandBoxFromPoint,
        corridor_constructor.hpp:18-44): snap to the voxel lattice; within
        1 cm of a lattice plane the box collapses onto it."""
        res = self.esdf.resolution
        p = point / res
        rp = jnp.round(p)
        near = jnp.abs(point - rp * res) < 0.01
        lo = jnp.where(near, rp, jnp.floor(p)).astype(jnp.int32)
        hi = jnp.where(near, rp, jnp.ceil(p)).astype(jnp.int32)
        return lo, hi

    def _at_world_min(self, lo):
        """Does the box's low corner sit at the world minimum (within eps)?
        (corridor_constructor.hpp:104)."""
        res = self.esdf.resolution
        wmin = jnp.asarray(self._wmin, jnp.float32)
        return lo.astype(jnp.float32) * res <= wmin + SP_EPSILON_FLOAT

    def _obstructed(self, lo, hi):
        return self.sat.box_obstructed(lo, hi, self._at_world_min(lo))

    def _axis_order(self, lo, hi, goal):
        """setAxisCand (corridor_constructor.hpp:142-182): 6 directions,
        toward-goal axes first in descending |delta|, away-from-goal last
        in ascending |delta|.  Reproduces the reference's exact insertion
        procedure including its tie behavior."""
        res = self.esdf.resolution
        mid = 0.5 * (lo + hi).astype(goal.dtype) * res
        delta = goal - mid
        values = jnp.abs(delta)
        offsets = jnp.where(delta > 0, 3, 0)

        v0, v1, v2 = values[0], values[1], values[2]
        # step 1: order = [0]
        # step 2: insert 1 (front if v1 > max=v0 else back)
        front1 = v1 > v0
        o0 = jnp.where(front1, 1, 0)
        o1 = jnp.where(front1, 0, 1)
        max2 = jnp.maximum(v0, v1)
        min2 = jnp.where(front1, jnp.inf, v1)
        # step 3: insert 2 (front / back / middle)
        front2 = v2 > max2
        back2 = (~front2) & (v2 < min2)
        ord0 = jnp.where(front2, 2, o0)
        ord1 = jnp.where(front2, o1, jnp.where(back2, o1, 2))
        ord1 = jnp.where(front2, o0, ord1)
        ord2 = jnp.where(front2, o1, jnp.where(back2, 2, o1))
        order = jnp.stack([ord0, ord1, ord2])

        off_sel = offsets[order]
        cand = jnp.zeros(6, jnp.int32)
        cand = cand.at[jnp.arange(3)].set(order + off_sel)
        cand = cand.at[5 - jnp.arange(3)].set(order + (3 - off_sel))
        return cand

    # ------------------------------------------------------------------
    def expand_box(self, point, goal):
        """Expand the seed box around `point` toward `goal`.

        Returns (box_min (3,), box_max (3,) metric, seed_ok bool).
        Exact round-robin face expansion of expand_box
        (corridor_constructor.hpp:184-232) with SAT checks.
        """
        res = self.esdf.resolution
        lo0, hi0 = self.initial_box(point)
        seed_ok = ~self._obstructed(lo0, hi0)
        cand = self._axis_order(lo0, hi0, goal)

        wmin = jnp.asarray(self._wmin, point.dtype)
        wmax = jnp.asarray(self._wmax, point.dtype)

        def try_expand(lo, hi, axis6):
            """Attempt a one-voxel expansion of face axis6 (0-2 low faces,
            3-5 high faces).  Returns (lo', hi', ok)."""
            ax = axis6 % 3
            is_high = axis6 >= 3
            one = jnp.zeros(3, jnp.int32).at[ax].set(1)
            lo_n = jnp.where(is_high, lo, lo - one)
            hi_n = jnp.where(is_high, hi + one, hi)
            # update slab: old face -> new face along ax, full elsewhere
            slab_lo = jnp.where(is_high, hi.at[ax].get(), lo_n.at[ax].get())
            slab_hi = jnp.where(is_high, hi_n.at[ax].get(), lo.at[ax].get())
            s_lo = lo_n.at[ax].set(slab_lo)
            s_hi = hi_n.at[ax].set(slab_hi)
            free = ~self._obstructed(s_lo, s_hi)
            inb = (jnp.all(s_lo.astype(point.dtype) * res
                           > wmin - SP_EPSILON) &
                   jnp.all(s_hi.astype(point.dtype) * res
                           < wmax + SP_EPSILON))
            ok = free & inb
            return (jnp.where(ok, lo_n, lo), jnp.where(ok, hi_n, hi), ok)

        def next_active(p, active):
            """Next active slot strictly after p, cyclically."""
            offs = jnp.arange(1, 7, dtype=jnp.int32)
            slots = (p + offs) % 6
            act = active[slots]
            first = jnp.argmax(act)
            return slots[first].astype(jnp.int32)

        def cond(st):
            lo, hi, active, p = st
            return jnp.any(active)

        def body(st):
            lo, hi, active, p = st
            p2 = next_active(p, active)
            axis6 = cand[p2]
            lo2, hi2, ok = try_expand(lo, hi, axis6)
            active2 = active.at[p2].set(ok)
            return (lo2, hi2, active2, p2)

        active0 = jnp.ones(6, bool) & seed_ok
        lo, hi, _, _ = jax.lax.while_loop(
            cond, body, (lo0, hi0, active0, jnp.asarray(5, jnp.int32)))
        return (lo.astype(point.dtype) * res, hi.astype(point.dtype) * res,
                seed_ok)

    # ------------------------------------------------------------------
    def expand_boxes(self, points, goals):
        """vmap over agents: points/goals (N, 3) ->
        (box_min (N, 3), box_max (N, 3), seed_ok (N,))."""
        return jax.vmap(self.expand_box)(points, goals)


def escape_seeds(builder: CorridorBuilder, pts):
    """Relocate seed points trapped inside the static-obstacle margin.

    A capped f32 QP can leave an agent a few mm inside the wall margin
    (esdf(p) < agent_radius); its seed box is then obstructed every
    cycle, the SFC window freezes, and the agent parks forever (observed
    on office/20agents_2: one agent pinned at esdf 0.141 < r 0.15).  The
    reference simply throws there (expandBoxFromPoint,
    corridor_constructor.hpp:35-38) and aborts the run -- CPLEX's f64
    solves never create the state.  Here the seed is nudged out of the
    margin along the ESDF gradient; downstream, update_sfc re-covers the
    held endpoint so the QP stays feasible and the agent slides back out.

    Returns (escaped_pts (N, 3), trapped (N,) bool).
    """
    esdf = builder.esdf
    res = esdf.resolution
    d0 = esdf.at_points(pts)
    need = (builder.agent_radius + 0.5 * res) - d0
    eye = jnp.eye(3, dtype=pts.dtype) * res
    grad = jnp.stack(
        [esdf.at_points(pts + eye[k]) - esdf.at_points(pts - eye[k])
         for k in range(3)], axis=-1) / (2.0 * res)
    nrm = jnp.linalg.norm(grad, axis=-1, keepdims=True)
    dirn = grad / jnp.maximum(nrm, 1e-6)
    trapped = need > 0
    return pts + dirn * jnp.maximum(need, 0.0)[:, None], trapped


def update_sfc(sfc_boxes, seed_points, goals, builder: CorridorBuilder,
               initialize):
    """generateFeasibleSFC (traj_planner.cpp:1451-1491), batched.

    sfc_boxes: (N, M, 6) [min, max]; seed_points: (N, 3) -- the previous
    solution endpoints (or current positions on (re)initialization);
    initialize: (N,) bool.  Shift the window one segment and expand a new
    last-segment box; on initialize, fill all segments with the fresh box.

    Trapped-seed escape is gated on ACTUAL seed-box obstruction (the
    same SAT check expand_box would fail on), not the esdf < r + res/2
    margin heuristic alone -- the heuristic also fires for legitimately
    safe wall-hugging seeds whose lattice box is free, and escaping
    those needlessly perturbs their corridors.  The escaped box is then
    extended back to the held endpoint per axis, and the extension is
    vetted against RAW occupancy: space inside the agent-radius margin
    (where the trapped agent already is) is acceptable recovery space,
    but if the extension would cross actual obstacle interior the
    update falls back to keep-previous-window.
    """
    N, M = sfc_boxes.shape[:2]
    res = builder.esdf.resolution

    lo0, hi0 = builder.initial_box(seed_points)
    seed_obstructed = builder._obstructed(lo0, hi0)          # (N,)
    seeds, margin_trapped = escape_seeds(builder, seed_points)
    trapped = seed_obstructed & margin_trapped
    use_seeds = jnp.where(trapped[:, None], seeds, seed_points)
    bmin, bmax, ok = builder.expand_boxes(use_seeds, goals)

    # per-axis minimal extension back to the held endpoint, so the hold
    # trajectory stays feasible and recovery can start
    ext_min = jnp.where(trapped[:, None],
                        jnp.minimum(bmin, seed_points), bmin)
    ext_max = jnp.where(trapped[:, None],
                        jnp.maximum(bmax, seed_points), bmax)
    # raw-occupancy vet of the extended box (cells overlapping it)
    k0 = jnp.asarray(builder.sat_raw.origin_key, jnp.int32)
    cell_lo = jnp.floor(ext_min / res + SP_EPSILON).astype(jnp.int32) - k0
    cell_hi = (jnp.ceil(ext_max / res - SP_EPSILON)
               .astype(jnp.int32) - 1) - k0
    raw_hit = builder.sat_raw._box_count(cell_lo, cell_hi) > 0
    ok = ok & (~trapped | ~raw_hit)
    bmin, bmax = ext_min, ext_max

    new_box = jnp.concatenate([bmin, bmax], axis=-1)          # (N, 6)
    shifted = jnp.concatenate([sfc_boxes[:, 1:], new_box[:, None]], axis=1)
    filled = jnp.broadcast_to(new_box[:, None], (N, M, 6))
    out = jnp.where(initialize[:, None, None], filled, shifted)
    # when the seed is obstructed (reference throws,
    # corridor_constructor.hpp:35-38) keep the previous window instead
    keep = jnp.concatenate([sfc_boxes[:, 1:], sfc_boxes[:, -1:]], axis=1)
    out = jnp.where(ok[:, None, None], out, keep)
    return out, ok
