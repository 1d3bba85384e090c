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
