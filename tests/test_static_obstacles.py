"""Mission `static` AABB obstacles as first-class world geometry.

Reference: static boxes are merged into the planner occupancy grid
(grid_based_planner.cpp:125-160) and handled by box closest-point
geometry (obstacle.hpp:437-478, geometry.hpp:237-362); the reference's
LSC mode itself punts on them ("use octomap", traj_planner.cpp:1375-1377).
Here they fold into the ESDF so the SFC corridor, wavefront grid planner,
LOS checks, and an exact box audit all see them.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

from lsc_planner_tpu.config import Param, GoalMode
from lsc_planner_tpu.missions import (ObstacleSpec,
                                      make_square_mission)
from lsc_planner_tpu.sim import audit
from lsc_planner_tpu.sim.simulator import SyncSimulator
from lsc_planner_tpu.world.esdf import ESDF


def _wall_mission():
    """Two agents swapping across a wall with side gaps: the straight
    line is blocked, the grid path must route around."""
    m = make_square_mission(2, half=3.0, world=(-5, -5, 0, 5, 5, 2.5))
    wall = ObstacleSpec(kind="static",
                        pose=np.array([0.0, 0.0, 1.25]),
                        dimensions=np.array([0.3, 2.0, 1.25]))
    return dataclasses.replace(m, obstacles=[wall])


def test_esdf_from_boxes_distance():
    boxes = np.array([[-1.0, -1.0, 0.0, 1.0, 1.0, 2.0]])
    esdf = ESDF.from_boxes(boxes, (-5, -5, 0), (5, 5, 2.5),
                           resolution=0.1)
    pts = jnp.asarray([[3.0, 0.0, 1.0],    # 2.0 m from the +x face
                       [0.0, 0.0, 1.0],    # inside
                       [1.5, 1.5, 1.0]])   # corner: sqrt(2)*0.5
    d = np.asarray(esdf.at_points(pts))
    assert abs(d[0] - 1.0) < 0.2           # clamped at max_dist=1.0
    assert d[1] < 0.1
    assert abs(d[2] - np.sqrt(0.5)) < 0.1


def test_static_box_audit_exact():
    boxes = jnp.asarray([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0]])
    pos = jnp.asarray([[2.0, 0.5, 0.5], [0.5, 0.5, 0.5]])
    r = jnp.asarray([0.5, 0.5])
    ratio = float(audit.static_box_safety_ratio(pos, boxes, r))
    assert abs(ratio - 0.0) < 1e-9         # agent 1 inside the box
    ratio0 = float(audit.static_box_safety_ratio(pos[:1], boxes, r[:1]))
    assert abs(ratio0 - 2.0) < 1e-9        # 1.0 m face dist / 0.5 radius


def test_wall_mission_routes_around():
    mission = _wall_mission()
    param = Param(goal_mode=GoalMode.PRIOR_BASED, qp_iterations=20)
    sim = SyncSimulator(mission, param, dtype=jnp.float64)
    # the wall is world geometry, not a dynamic obstacle
    assert sim.O_dyn == 0
    assert sim.static_boxes.shape == (1, 6)
    assert sim.corridor is not None and sim.goal_planner.grid_planner \
        is not None
    state = sim.initial_state()
    for it in range(200):
        state, info = sim._cycle_jit(state)
        if sim.is_finished(state):
            break
    assert sim.is_finished(state), "agents did not reach goals"
    assert float(state.safety_agent_min) >= 1.0
    # exact box audit: never penetrated the wall
    assert float(state.safety_obs_min) >= 1.0
    # the detour must be longer than the straight 2 * 6 m swap (2 agents x 2*half)
    assert float(state.distance) > 12.0


def test_mission_gate_rejects_start_inside_wall():
    m = make_square_mission(2, half=3.0, world=(-5, -5, 0, 5, 5, 2.5))
    wall = ObstacleSpec(kind="static",
                        pose=np.array(m.agents[0].start, float),
                        dimensions=np.array([0.5, 0.5, 0.5]))
    m = dataclasses.replace(m, obstacles=[wall])
    param = Param(goal_mode=GoalMode.PRIOR_BASED)
    try:
        SyncSimulator(m, param, dtype=jnp.float64)
        raise AssertionError("expected ValueError for start inside wall")
    except ValueError as e:
        assert "incompatible" in str(e)
