"""Multi-chip sharded cycle on the virtual 8-device CPU mesh: must compile,
run, and agree with the single-device cycle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsc_planner_tpu.config import Param, GoalMode
from lsc_planner_tpu.missions import make_circle_mission
from lsc_planner_tpu.parallel import shard as pshard
from lsc_planner_tpu.sim.simulator import SyncSimulator


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pshard.make_mesh(8)


def test_sharded_cycle_matches_single(mesh):
    mission = make_circle_mission(16, radius=4.0)
    p = Param(goal_mode=GoalMode.PRIOR_BASED, qp_iterations=14)
    sim = SyncSimulator(mission, p, dtype=jnp.float64)
    cycle_sharded = pshard.make_sharded_cycle(sim, mesh)

    state_s = pshard.shard_state(sim.initial_state(), mesh)
    state_1 = sim.initial_state()
    for _ in range(3):
        state_s, info_s = cycle_sharded(state_s)
        state_1, info_1 = sim._cycle_jit(state_1)
    np.testing.assert_allclose(np.asarray(state_s.traj),
                               np.asarray(state_1.traj), atol=1e-8)
    np.testing.assert_allclose(float(state_s.safety_agent_min),
                               float(state_1.safety_agent_min), atol=1e-8)
    np.testing.assert_allclose(float(state_s.distance),
                               float(state_1.distance), atol=1e-7)


def test_sharded_run_completes(mesh):
    mission = make_circle_mission(8, radius=3.0,
                                  world=(-5, -5, 0, 5, 5, 2.5))
    p = Param(goal_mode=GoalMode.PRIOR_BASED, qp_iterations=14)
    sim = SyncSimulator(mission, p, dtype=jnp.float64)
    cycle = pshard.make_sharded_cycle(sim, mesh)
    # run with host loop but sharded cycle
    state = pshard.shard_state(sim.initial_state(), mesh)

    def cycle_fn(s):
        return cycle(s)

    summary = sim.run(max_iterations=300, cycle_fn=cycle_fn)
    assert summary["iterations"] < 300
    assert not summary["is_collided"]
    assert summary["safety_ratio_agent"] >= 1.0
