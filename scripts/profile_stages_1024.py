#!/usr/bin/env python
"""Per-stage device timing at 1024 agents (production bench config)."""
import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lsc_planner_tpu.runtime import enable_compilation_cache
enable_compilation_cache()

import jax.numpy as jnp

from lsc_planner_tpu.config import Param, GoalMode
from lsc_planner_tpu.missions import make_circle_mission
from lsc_planner_tpu.sim.simulator import SyncSimulator


def main():
    qn = 1024
    radius = max(4.0, 0.45 * qn / math.pi)
    w = radius + 2.0
    mission = make_circle_mission(qn, radius=radius,
                                  world=(-w, -w, 0, w, w, 2.5))
    param = Param(goal_mode=GoalMode.PRIOR_BASED, qp_iterations=14,
                  max_neighbors=32)
    sim = SyncSimulator(mission, param, dtype=jnp.float32)
    state = sim.initial_state()
    state, _ = sim._cycle_jit(state)   # one real cycle for realistic state
    times = sim.profile_stages(state, n_cycles=5)
    print(json.dumps({k: round(v * 1e3, 3) for k, v in times.items()}))


if __name__ == "__main__":
    main()
