"""2-D world mode, patrol, goal services, f32/f64 divergence."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from lsc_planner_tpu.config import Param, GoalMode
from lsc_planner_tpu.missions import make_circle_mission
from lsc_planner_tpu.sim.simulator import SyncSimulator


def test_2d_world_mode():
    """world_dimension=2: planar mission at z_2d; z must stay put."""
    mission = make_circle_mission(6, radius=3.0, z=0.6,
                                  world=(-5, -5, 0, 5, 5, 1.2))
    p = Param(world_dimension=2, world_z_2d=0.6,
              goal_mode=GoalMode.PRIOR_BASED, qp_iterations=12)
    sim = SyncSimulator(mission, p, dtype=jnp.float64)
    summary = sim.run(max_iterations=300)
    assert summary["iterations"] < 300
    assert not summary["is_collided"]
    state = summary["final_state"]
    z = np.asarray(state.pos)[:, 2]
    np.testing.assert_allclose(z, 0.6, atol=0.05)


def test_patrol_mode_swaps_goals():
    mission = make_circle_mission(2, radius=2.0,
                                  world=(-4, -4, 0, 4, 4, 2.5))
    p = Param(multisim_patrol=True, goal_mode=GoalMode.STATIC,
              qp_iterations=10)
    sim = SyncSimulator(mission, p, dtype=jnp.float64)
    state = sim.initial_state()
    start0 = np.asarray(state.start).copy()
    goal0 = np.asarray(state.desired_goal).copy()
    ever_swapped = False
    for _ in range(220):
        state, info = sim._cycle_jit(state)
        if np.allclose(np.asarray(state.desired_goal), start0, atol=1e-6):
            ever_swapped = True
    assert ever_swapped, "patrol never swapped start/goal"
    assert not sim.is_finished(state)      # patrol never finishes


def test_update_goal_service():
    mission = make_circle_mission(3, radius=2.0,
                                  world=(-4, -4, 0, 4, 4, 2.5))
    p = Param(goal_mode=GoalMode.STATIC, qp_iterations=10)
    sim = SyncSimulator(mission, p, dtype=jnp.float64)
    state = sim.initial_state()
    for _ in range(5):
        state, _ = sim._cycle_jit(state)
    new_goals = np.asarray(state.pos).copy()      # stop where you are
    state = sim.update_goals(state, new_goals)
    for _ in range(30):
        state, _ = sim._cycle_jit(state)
    d = np.linalg.norm(np.asarray(state.pos) - new_goals, axis=-1)
    assert d.max() < 0.2


def test_f32_matches_f64_single_cycle():
    """Numerical-fidelity contract at the solver level: one full planning
    cycle in f32 must match f64 to sub-centimetre on every control point.
    (Over long horizons the closed-loop multi-agent dynamics are chaotic:
    discrete priority/tie branches amplify rounding differences, so
    trajectory-level agreement is only meaningful per cycle -- the same
    caveat SURVEY.md 7.2 raises for reference comparisons.)"""
    mission = make_circle_mission(8, radius=3.0,
                                  world=(-5, -5, 0, 5, 5, 2.5))
    mission.add_noise(0.02, 3, rng=np.random.default_rng(5))
    # early exit OFF: the f64 path reaches the dual-residual tolerance
    # iterations before f32's cancellation floor allows, so with exit on
    # the two dtypes run DIFFERENT iteration counts and the comparison
    # measures truncation, not precision
    p = Param(goal_mode=GoalMode.PRIOR_BASED, qp_iterations=14,
              qp_tol_gap=0.0)
    trajs1 = {}
    trajs3 = {}
    pres = {}
    for name, dt in [("f32", jnp.float32), ("f64", jnp.float64)]:
        sim = SyncSimulator(mission, p, dtype=dt)
        state = sim.initial_state()
        state, _ = sim._cycle_jit(state)
        trajs1[name] = np.asarray(state.traj, np.float64)
        for _ in range(2):
            state, _ = sim._cycle_jit(state)
        trajs3[name] = np.asarray(state.traj, np.float64)
        pres[name] = float(np.max(np.asarray(state.primal_res)))
    # f32 is feasibility-exact (constraints hold to ~1e-7) but the dual
    # residual hits a cancellation floor at the jerk-Gram scale, so
    # optimality lands at the centimetre level; f64 is the exactness
    # path.  The SINGLE-cycle error is the meaningful per-solve
    # contract (4.0 cm with the round-5 delta-coordinate solve; was
    # 5.6 cm before it); across cycles the closed loop crosses discrete
    # priority/tie branches and only a loose sanity bound is stable.
    err1 = np.abs(trajs1["f32"] - trajs1["f64"]).max()
    assert err1 < 0.05, err1
    err3 = np.abs(trajs3["f32"] - trajs3["f64"]).max()
    assert err3 < 0.5, err3
    assert pres["f32"] < 1e-4, pres
    assert pres["f64"] < 1e-8, pres

    # both dtypes must also complete the mission collision-free
    for dt in (jnp.float32, jnp.float64):
        sim = SyncSimulator(mission, p, dtype=dt)
        summary = sim.run(max_iterations=250)
        assert summary["iterations"] < 250
        assert summary["safety_ratio_agent"] >= 1.0
