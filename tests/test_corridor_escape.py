"""Trapped-seed escape gating + extension vetting (ADVICE r4 medium #1).

Round 4 shipped `escape_seeds` keyed on the margin heuristic
esdf(p) < r + res/2 and extended the escaped box back to the held
endpoint with NO occupancy check, so (a) legitimately safe wall-hugging
seeds got needlessly escaped, and (b) the extension slab became
QP-feasible unverified space that could cross actual obstacle interior.
Round 5 gates the escape on actual seed-box obstruction (the same SAT
check expand_box fails on) and vets the extension against RAW occupancy,
falling back to keep-previous-window when it would cross an obstacle.
"""
import jax.numpy as jnp
import numpy as np

from lsc_planner_tpu.world.corridor import (CorridorBuilder, escape_seeds,
                                            update_sfc)
from lsc_planner_tpu.world.esdf import ESDF


def _builder(occ_cells, dims=(40, 40, 10), res=0.1, radius=0.15):
    occ = np.zeros(dims, bool)
    for c in occ_cells:
        occ[c] = True
    esdf = ESDF.from_occupancy(occ, origin_key=(0, 0, 0), resolution=res)
    wmax = tuple(d * res for d in dims)
    return CorridorBuilder(esdf=esdf, world_min=np.zeros(3),
                           world_max=np.asarray(wmax),
                           agent_radius=radius)


def test_wall_hugging_free_seed_not_escaped():
    """A seed inside the esdf margin whose LATTICE box is nevertheless
    free must NOT be escaped: the margin heuristic alone fires, the SAT
    gate does not.  (Requires a margin thinner than the corner-sampled
    shell: r + res/2 = 0.12 covers face neighbours of the obstacle
    voxel but not the diagonals the box check samples.)"""
    b = _builder([(20, 20, 5)], radius=0.07)
    # cell (21,20,5): esdf = 0.1 < r + res/2 = 0.12, but every cell the
    # reference-sampled set of its seed box touches is >= 0.141 -> free
    seed = jnp.asarray([[2.151, 2.051, 0.551]])
    _, margin_trapped = escape_seeds(b, seed)
    assert bool(margin_trapped[0]), "margin heuristic should fire"
    lo0, hi0 = b.initial_box(seed)
    assert not bool(b._obstructed(lo0, hi0)[0]), "seed box must be free"

    sfc = jnp.tile(jnp.asarray([[2.0, 1.9, 0.4, 2.4, 2.3, 0.8]]),
                   (1, 5, 1)).reshape(1, 5, 6)
    goal = jnp.asarray([[3.5, 2.0, 0.55]])
    out, ok = update_sfc(sfc, seed, goal, b, jnp.asarray([False]))
    assert bool(ok[0])
    # un-escaped expansion: the new last box comes from the ORIGINAL
    # seed (identical to expanding there directly, no extension slab)
    bmin, bmax, seed_ok = b.expand_boxes(seed, goal)
    np.testing.assert_allclose(np.asarray(out[0, -1, :3]),
                               np.asarray(bmin[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, -1, 3:]),
                               np.asarray(bmax[0]), atol=1e-6)


def test_seed_inside_obstacle_keeps_previous_window():
    """A seed inside actual obstacle interior: the escaped box cannot be
    extended back without crossing raw occupancy -> the update must keep
    the previous window (ok=False), not hand the QP obstacle interior."""
    wall = [(20, y, z) for y in range(40) for z in range(10)]
    b = _builder(wall)
    seed = jnp.asarray([[2.05, 2.05, 0.55]])       # center of occupied cell
    prev = jnp.tile(jnp.asarray([[1.0, 1.5, 0.3, 1.9, 2.5, 0.9]]),
                    (1, 5, 1)).reshape(1, 5, 6)
    goal = jnp.asarray([[3.5, 2.05, 0.55]])
    out, ok = update_sfc(prev, seed, goal, b, jnp.asarray([False]))
    assert not bool(ok[0])
    # keep-previous-window semantics: shifted window of the old boxes
    np.testing.assert_allclose(np.asarray(out[0, -1]),
                               np.asarray(prev[0, -1]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 0]),
                               np.asarray(prev[0, 1]), atol=1e-6)


def test_free_seed_box_contains_seed():
    """Plain path: free seeds expand to boxes containing them."""
    b = _builder([(20, 20, 5)])
    seeds = jnp.asarray([[1.0, 1.0, 0.5], [3.0, 3.0, 0.5]])
    goals = jnp.asarray([[3.0, 1.0, 0.5], [1.0, 3.0, 0.5]])
    sfc = jnp.zeros((2, 5, 6))
    out, ok = update_sfc(sfc, seeds, goals, b,
                         jnp.asarray([True, True]))
    assert bool(ok.all())
    box = np.asarray(out[:, -1])
    s = np.asarray(seeds)
    assert (box[:, :3] <= s + 1e-6).all() and (box[:, 3:] >= s - 1e-6).all()
