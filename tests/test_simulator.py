"""End-to-end simulation tests: the minimal slice of SURVEY.md 7.1 step 5.

multi_simple3-equivalent mission (3 agents, empty world, LSC) must complete
with 100% success, zero collisions, and min safety ratio >= 1.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from lsc_planner_tpu.config import Param, GoalMode, PlannerMode
from lsc_planner_tpu.missions import (Mission, AgentSpec, make_circle_mission)
from lsc_planner_tpu.sim.simulator import SyncSimulator


def simple3_mission():
    """The multi_simple3.json scenario (reference missions/)."""
    agents = []
    starts = [(-2.0, 0.0, 1.0), (2.0, 2.0, 1.0), (2.0, -2.0, 1.0)]
    goals = [(2.0, 0.0, 1.0), (-1.0, -1.0, 1.0), (0.0, 2.0, 1.0)]
    for qi, (s, g) in enumerate(zip(starts, goals)):
        a = AgentSpec(id=qi, cid=qi + 1)
        a.start = np.asarray(s)
        a.goal = np.asarray(g)
        agents.append(a)
    return Mission(world_min=np.array([-5.0, -5, 0]),
                   world_max=np.array([5.0, 5, 2.5]),
                   agents=agents, mission_file_name="multi_simple3")


@pytest.mark.parametrize("goal_mode", [GoalMode.STATIC,
                                       GoalMode.PRIOR_BASED])
def test_simple3_completes(goal_mode):
    p = Param(goal_mode=goal_mode, qp_iterations=14)
    sim = SyncSimulator(simple3_mission(), p, dtype=jnp.float64)
    summary = sim.run(max_iterations=200)
    assert summary["iterations"] < 200, "did not finish"
    assert not summary["is_collided"]
    assert summary["safety_ratio_agent"] >= 1.0
    assert np.isfinite(summary["total_flight_time"])
    # flight distance is at least the sum of straight-line distances
    min_dist = sum(np.linalg.norm(np.array(g) - np.array(s))
                   for s, g in [((-2, 0, 1), (2, 0, 1)),
                                ((2, 2, 1), (-1, -1, 1)),
                                ((2, -2, 1), (0, 2, 1))])
    assert summary["total_flight_distance"] >= min_dist - 0.1
    assert summary["total_flight_distance"] < 3 * min_dist


def test_circle8_priority_completes():
    """8-agent antipodal circle swap -- the deadlock-prone benchmark shape;
    priority-based goal planning must resolve it."""
    mission = make_circle_mission(8, radius=3.0,
                                  world=(-5, -5, 0, 5, 5, 2.5))
    p = Param(goal_mode=GoalMode.PRIOR_BASED, qp_iterations=14)
    sim = SyncSimulator(mission, p, dtype=jnp.float64)
    summary = sim.run(max_iterations=300)
    assert summary["iterations"] < 300, "did not finish (deadlock?)"
    assert not summary["is_collided"]
    assert summary["safety_ratio_agent"] >= 1.0


def test_first_cycle_feasible():
    """The very first QP (constant-velocity prediction from rest) must be
    feasible and keep agents at their starts."""
    mission = simple3_mission()
    p = Param(qp_iterations=14)
    sim = SyncSimulator(mission, p, dtype=jnp.float64)
    state = sim.initial_state()
    state, info = sim._cycle_jit(state)
    assert float(jnp.max(state.primal_res)) < 1e-6
    traj = np.asarray(state.traj)
    np.testing.assert_allclose(traj[:, 0, 0, :],
                               np.asarray(sim.start), atol=1e-6)


def test_stall_count_hysteresis():
    """Stall bookkeeping: +1 stalled, -1 moving without closing on the
    goal, reset on plain cycle-over-cycle progress; the separate
    watermark signal (progress_best) fires only on beating the
    best-ever goal distance (coming BACK from a rescue push-back is
    plain progress but NOT watermark progress)."""
    from lsc_planner_tpu.sim.simulator import _update_stall_count
    p = Param()
    goal = jnp.asarray([[10.0, 0.0, 1.0]])
    seq = jnp.asarray(5)
    pos0 = jnp.asarray([[0.0, 0.0, 1.0]])
    best0 = jnp.asarray([10.0])             # watermark = dist(pos0, goal)
    v_still = jnp.zeros((1, 3))
    v_move = jnp.asarray([[0.0, 1.0, 0.0]])

    c = jnp.asarray([7], jnp.int32)
    # stalled in place -> +1, no progress, watermark unchanged
    c1, pr1, pb1, b1 = _update_stall_count(c, best0, pos0, pos0, v_still,
                                           goal, seq, p)
    assert int(c1[0]) == 8 and not bool(pr1[0]) and float(b1[0]) == 10.0
    # moving sideways (no gain) -> decay, not reset
    pos_side = jnp.asarray([[0.0, 0.5, 1.0]])
    c2, pr2, pb2, b2 = _update_stall_count(c1, b1, pos0, pos_side, v_move,
                                           goal, seq, p)
    assert int(c2[0]) == 7 and not bool(pr2[0])
    # real progress -> hard reset, watermark drops, both signals fire
    pos_fwd = jnp.asarray([[0.5, 0.0, 1.0]])
    c3, pr3, pb3, b3 = _update_stall_count(c2, b2, pos_side, pos_fwd,
                                           v_move, goal, seq, p)
    assert int(c3[0]) == 0 and bool(pr3[0]) and bool(pb3[0])
    assert float(b3[0]) == 9.5
    # push-back recovery: thrown back 1.5 m, then closing again is
    # PLAIN progress (stall resets) but NOT watermark progress
    pos_back = jnp.asarray([[-1.0, 0.0, 1.0]])
    c4, pr4, pb4, b4 = _update_stall_count(c3, b3, pos_back, pos_fwd,
                                           v_move, goal, seq, p)
    assert bool(pr4[0]) and not bool(pb4[0]) and int(c4[0]) == 0
    # decay floors at zero
    c5, _, _, _ = _update_stall_count(jnp.asarray([0], jnp.int32), b3,
                                      pos0, pos_side, v_move, goal, seq, p)
    assert int(c5[0]) == 0


def test_rescue_waypoint_latch():
    """Latched escape waypoints: engage on threshold crossing, persist
    while chasing, release on progress, rotate phase on re-engagement."""
    from lsc_planner_tpu.sim.simulator import (SyncSimulator, _update_rescue)
    mission = make_circle_mission(2, radius=4.0,
                                  world=(-6, -6, 0, 6, 6, 2.5))
    sim = SyncSimulator(mission, Param(), dtype=jnp.float64)
    st = sim.initial_state()
    p = sim.param
    pos = st.pos
    goal = st.desired_goal
    stall = jnp.asarray([p.deadlock_seq_threshold + 1, 0], jnp.int32)
    no_prog = jnp.zeros(2, bool)

    g1, a1, ph1, c1 = _update_rescue(st, pos, goal, stall, no_prog, p)
    assert bool(a1[0]) and not bool(a1[1])
    # phase records the candidate ACTUALLY latched (1-based): the
    # path_floor candidate (index 0) is degenerate here (initial state
    # floors it at pos), so the first engagement latches the 90-degree
    # rotation at index 1 -> phase 2
    assert int(ph1[0]) == 2
    # engagement resets the stall count (starts the expiry clock)
    assert int(c1[0]) == 0
    # 90-degree rotation: waypoint perpendicular to the goal direction
    gdir = np.asarray(goal[0] - pos[0])
    wdir = np.asarray(g1[0] - pos[0])
    assert abs(np.dot(gdir[:2], wdir[:2])) < 1e-9

    # while active and no progress: waypoint persists even as stall decays
    st2 = st._replace(rescue_goal=g1, rescue_active=a1, rescue_phase=ph1)
    g2, a2, ph2, _ = _update_rescue(st2, pos, goal,
                                    jnp.zeros(2, jnp.int32), no_prog, p)
    assert bool(a2[0])
    np.testing.assert_allclose(np.asarray(g2[0]), np.asarray(g1[0]))

    # progress releases the latch and resets the phase
    prog = jnp.asarray([True, False])
    _, a3, ph3, _ = _update_rescue(st2, pos, goal,
                                   jnp.zeros(2, jnp.int32), prog, p)
    assert not bool(a3[0]) and int(ph3[0]) == 0

    # re-engagement without progress escalates past the failed candidate
    st4 = st._replace(rescue_phase=ph1)     # inactive, phase 2 remembered
    g4, a4, ph4, _ = _update_rescue(st4, pos, goal, stall, no_prog, p)
    assert bool(a4[0]) and int(ph4[0]) == 3
    assert np.linalg.norm(np.asarray(g4[0] - g1[0])) > 1e-6

    # an unreachable waypoint EXPIRES: still active + stall re-crosses the
    # threshold -> abandon it, rotate the phase, re-latch a new waypoint
    g5, a5, ph5, c5 = _update_rescue(st2, pos, goal, stall, no_prog, p)
    assert bool(a5[0]) and int(ph5[0]) == 3 and int(c5[0]) == 0
    assert np.linalg.norm(np.asarray(g5[0] - g1[0])) > 1e-6


def test_fused_dispatch_matches_per_cycle():
    """steps_per_dispatch=k (lax.scan-fused cycles, one device dispatch
    per k cycles) must reproduce the per-cycle host loop exactly: same
    finishing iteration, flight time, and collision verdict."""
    mission = make_circle_mission(6, radius=3.0,
                                  world=(-5, -5, 0, 5, 5, 2.5))
    param = Param(goal_mode=GoalMode.PRIOR_BASED, qp_iterations=10)

    s_ref = SyncSimulator(mission, param, dtype=jnp.float64).run(
        max_iterations=120)
    s_fus = SyncSimulator(mission, param, dtype=jnp.float64).run(
        max_iterations=120, steps_per_dispatch=8)

    assert s_ref["iterations"] < 120
    assert s_fus["iterations"] == s_ref["iterations"]
    np.testing.assert_allclose(s_fus["total_flight_time"],
                               s_ref["total_flight_time"])
    assert not s_fus["is_collided"]
    assert s_fus["safety_ratio_agent"] >= 1.0
    # distance is truncated at the finish cycle -> exact match
    np.testing.assert_allclose(s_fus["total_flight_distance"],
                               s_ref["total_flight_distance"],
                               rtol=1e-12)


def test_fused_dispatch_rejects_dynamic_obstacles():
    mission = make_circle_mission(4, radius=3.0,
                                  world=(-5, -5, 0, 5, 5, 2.5))
    sim = SyncSimulator(mission, Param(), dtype=jnp.float64)
    with pytest.raises(ValueError):
        sim.run(steps_per_dispatch=4, log=object())


def test_knn_pruning_cutoff_and_overflow_audit():
    """K-NN pruning guard: neighbours beyond the interaction ball
    (2 vmax T + r_i + r_j) are masked out of the LSC rows; agents whose
    K-th nearest neighbour is still INSIDE the ball are flagged by the
    density-overflow audit (K too small for the local crowding)."""
    import math
    from lsc_planner_tpu.missions import make_circle_mission
    # tight ring: every agent has 7 others within the ~2.3 m ball
    p = Param(goal_mode=GoalMode.PRIOR_BASED, qp_iterations=14,
              max_neighbors=3)
    sim = SyncSimulator(make_circle_mission(
        8, radius=1.0, world=(-3, -3, 0, 3, 3, 2.5)), p,
        dtype=jnp.float64)
    state = sim.initial_state()
    state, info = sim._cycle_jit(state)
    assert info.knn_overflow is not None
    assert bool(np.asarray(info.knn_overflow).all())

    # sparse ring: nobody within the ball -> no overflow, planes masked,
    # cycle still runs fine
    radius = 8.0 / (2 * math.sin(math.pi / 8))   # ~10.5 m spacing
    sim2 = SyncSimulator(make_circle_mission(
        8, radius=radius, world=(-radius - 2, -radius - 2, 0,
                                 radius + 2, radius + 2, 2.5)), p,
        dtype=jnp.float64)
    s2 = sim2.initial_state()
    s2, info2 = sim2._cycle_jit(s2)
    assert not bool(np.asarray(info2.knn_overflow).any())
    assert np.isfinite(np.asarray(s2.traj)).all()
