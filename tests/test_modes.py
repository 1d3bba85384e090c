"""Planner-mode parity tests: BVC and Reciprocal-RSFC end-to-end."""
import jax.numpy as jnp
import numpy as np
import pytest

from lsc_planner_tpu.config import Param, PlannerMode, GoalMode
from lsc_planner_tpu.missions import make_circle_mission
from lsc_planner_tpu.sim.simulator import SyncSimulator


def test_bvc_mode_e2e():
    mission = make_circle_mission(6, radius=3.0,
                                  world=(-5, -5, 0, 5, 5, 2.5))
    p = Param(planner_mode=PlannerMode.BVC, goal_mode=GoalMode.PRIOR_BASED,
              qp_iterations=14)
    sim = SyncSimulator(mission, p, dtype=jnp.float64)
    summary = sim.run(max_iterations=400)
    assert summary["iterations"] < 400
    assert not summary["is_collided"]


def test_rsfc_mode_e2e():
    mission = make_circle_mission(4, radius=2.5,
                                  world=(-5, -5, 0, 5, 5, 2.5))
    p = Param(planner_mode=PlannerMode.RECIPROCAL_RSFC,
              goal_mode=GoalMode.STATIC, qp_iterations=16)
    sim = SyncSimulator(mission, p, dtype=jnp.float64)
    summary = sim.run(max_iterations=400)
    assert summary["iterations"] < 400
    # RSFC relies on slack; require near-safe behaviour
    assert summary["safety_ratio_agent"] > 0.9
