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


def test_linear_prediction_slowdown():
    """Head-on constant-velocity predictions get contracted
    (traj_planner.cpp:1310-1330): alpha = t_collision / horizon."""
    from lsc_planner_tpu.planner import prediction as pred
    M, n, dt = 5, 5, 0.2
    pos = jnp.asarray([[0.0, 0.0, 1.0], [2.0, 0.0, 1.0]])
    vel = jnp.asarray([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    init = pred.constant_velocity_traj(pos, vel, M, n, dt)
    obs_pred = jnp.stack([init[::-1], init[::-1]])[:, :1]  # each sees other
    obs_pred = jnp.stack([init[1:2], init[0:1]])           # (2, 1, M, n+1, 3)
    radius = jnp.asarray([0.15, 0.15])
    obs_radius = jnp.asarray([[0.15], [0.15]])
    mask = jnp.ones((2, 1), bool)
    alpha = pred.linear_prediction_slowdown(init, obs_pred, radius,
                                            obs_radius, mask, horizon=M * dt)
    # closing speed 2 m/s over gap 2 - 0.3 -> collision at t=0.85s of 1.0s
    np.testing.assert_allclose(np.asarray(alpha), [0.85, 0.85], atol=1e-3)
    contracted = pred.contract_trajectories(init, alpha)
    np.testing.assert_allclose(
        np.asarray(contracted[0, -1, -1]),
        np.asarray(init[0, 0, 0] + 0.85 * (init[0, -1, -1] - init[0, 0, 0])),
        atol=1e-6)
    # far-apart agents: no slowdown
    pos2 = jnp.asarray([[0.0, 0.0, 1.0], [50.0, 0.0, 1.0]])
    init2 = pred.constant_velocity_traj(pos2, vel, M, n, dt)
    obs2 = jnp.stack([init2[1:2], init2[0:1]])
    a2 = pred.linear_prediction_slowdown(init2, obs2, radius, obs_radius,
                                         mask, horizon=M * dt)
    np.testing.assert_allclose(np.asarray(a2), [1.0, 1.0])
