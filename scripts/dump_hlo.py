#!/usr/bin/env python
"""Dump optimized HLO of the fused 10-cycle dispatch at 1024 agents."""
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
    multi = sim.make_scan_cycle(10)
    lowered = multi.lower(state)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open("/tmp/cycle_hlo.txt", "w") as f:
        f.write(txt)
    print("wrote /tmp/cycle_hlo.txt", len(txt))


if __name__ == "__main__":
    main()
