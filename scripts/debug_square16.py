"""Diagnose the square16+forest parity run: per-cycle distance-to-goal."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from lsc_planner_tpu.config import Param, GoalMode
from lsc_planner_tpu.missions import load_mission
from lsc_planner_tpu.sim.simulator import SyncSimulator
from lsc_planner_tpu.world.esdf import ESDF

MISSION = "/root/reference/missions/multi_square16.json"
WORLD = "/root/reference/world/simple_forest.bt"

param = Param(goal_mode=GoalMode.PRIOR_BASED, world_use_octomap=True,
              qp_iterations=14, multisim_max_noise=0.02)
mission = load_mission(MISSION, param, rng=np.random.default_rng(11))
esdf = ESDF.from_bt(WORLD, mission.world_min, mission.world_max,
                    dtype=jnp.float64)
sim = SyncSimulator(mission, param, esdf=esdf, dtype=jnp.float64)

state = sim.initial_state()
for it in range(400):
    state, info = sim._cycle_jit(state)
    state.traj.block_until_ready()
    d = np.linalg.norm(np.asarray(state.pos - state.desired_goal), axis=-1)
    if it % 10 == 0 or it > 150:
        stall = np.asarray(state.stall_count)
        resc = np.asarray(state.rescue_active)
        far = np.argsort(d)[-4:][::-1]
        print(f"it={it:3d} maxd={d.max():6.3f} n_unfinished="
              f"{(d > param.goal_threshold).sum():2d} "
              f"far={[(int(i), round(float(d[i]),2), int(stall[i]), bool(resc[i])) for i in far]} "
              f"safety={float(info.safety_step_min):.3f}")
    if d.max() < param.goal_threshold:
        print(f"FINISHED at it={it}")
        break
