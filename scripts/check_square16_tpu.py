#!/usr/bin/env python
"""Run the reference benchmark artifact (multi_square16 + simple_forest)
on the real TPU in production f32 -- the configuration that exposed the
wavefront kernel's SMEM block-shape lowering bug."""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lsc_planner_tpu.runtime import enable_compilation_cache
enable_compilation_cache()

import jax.numpy as jnp
import numpy as np

from lsc_planner_tpu.config import Param, GoalMode
from lsc_planner_tpu.missions import load_mission
from lsc_planner_tpu.sim.simulator import SyncSimulator
from lsc_planner_tpu.world.esdf import ESDF

MISSION = "/root/reference/missions/multi_square16.json"
WORLD = "/root/reference/world/simple_forest.bt"


def main():
    param = Param(goal_mode=GoalMode.PRIOR_BASED, world_use_octomap=True,
                  multisim_max_noise=0.02)   # framework-default solver
    mission = load_mission(MISSION, param, rng=np.random.default_rng(11))
    esdf = ESDF.from_bt(WORLD, mission.world_min, mission.world_max,
                        dtype=jnp.float32)
    sim = SyncSimulator(mission, param, esdf=esdf, dtype=jnp.float32)
    s = sim.run(max_iterations=400)
    print(json.dumps({
        "iterations": s["iterations"], "collided": bool(s["is_collided"]),
        "safety": round(float(s["safety_ratio_agent"]), 4),
        "dist": round(float(s["total_flight_distance"]), 1),
        "flight_time": round(float(s["total_flight_time"]), 1)}))


if __name__ == "__main__":
    main()
