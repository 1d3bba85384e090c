"""Deep-dive agent 8 in the square16+forest run at a stuck iteration."""
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
for it in range(200):
    state, info = sim._cycle_jit(state)
state.traj.block_until_ready()

qi = 8
pos = np.asarray(state.pos)
goal = np.asarray(state.desired_goal)
print("pos[8] =", pos[qi], " goal[8] =", goal[qi])
print("dist  =", np.linalg.norm(pos[qi] - goal[qi]))
print("esdf at pos =", float(esdf.at_points(jnp.asarray(pos[qi]))))
print("esdf at goal =", float(esdf.at_points(jnp.asarray(goal[qi]))))
print("radius =", float(np.asarray(sim.radius)[qi]))
print("current_goal[8] =", np.asarray(state.current_goal)[qi])
print("rescue_goal[8] =", np.asarray(state.rescue_goal)[qi],
      "active =", bool(np.asarray(state.rescue_active)[qi]),
      "phase =", int(np.asarray(state.rescue_phase)[qi]))
print("esdf at rescue =", float(esdf.at_points(
    jnp.asarray(np.asarray(state.rescue_goal)[qi]))))
print("sfc[8] =", np.asarray(state.sfc)[qi])

# --- goal planner internals for agent 8 ---
gp = sim.goal_planner.grid_planner
pos_j = state.pos
init, prediction = sim.predict_and_init(state.traj, state.pos, state.vel,
                                        state.seq,
                                        prev_goal=state.current_goal)
init_end = np.asarray(init[:, -1, -1, :])
print("init_end[8] =", init_end[qi])
print("esdf at init_end =", float(esdf.at_points(jnp.asarray(init_end[qi]))))

N = sim.N
self_mask = jnp.eye(N, dtype=bool)
# replicate the priority mask from goal.py _prior_based
dist_to_goal = jnp.linalg.norm(state.pos - state.desired_goal, axis=-1)
obs_dist_to_goal = dist_to_goal[None, :]
near_own_goal = dist_to_goal < param.goal_threshold
obs_near_goal = obs_dist_to_goal < param.goal_threshold
obs_end = state.traj[:, -1, -1, :]
obs_first_end = state.traj[:, 0, -1, :]
dirn = jnp.einsum("jd,ijd->ij", obs_end - obs_first_end,
                  obs_first_end[None, :, :] - state.pos[:, None, :])
same_dir = (~near_own_goal[:, None]) & (dirn > 0)
higher = ((~self_mask) & (~obs_near_goal) & (~same_dir) &
          (near_own_goal[:, None] |
           (obs_dist_to_goal < dist_to_goal[:, None])))
print("higher[8] any:", bool(jnp.any(higher[qi])))

occ_hp = gp.occupancy(sim.radius, sim.downwash, state.pos, sim.radius,
                      sim.downwash, higher)
start = jax.vmap(gp.to_cell)(state.pos)
goal_c = jax.vmap(gp.to_cell)(state.desired_goal)
start_r = jax.vmap(gp.recover_start)(occ_hp, start)
print("start cell:", np.asarray(start)[qi], "recovered:",
      np.asarray(start_r)[qi], "goal cell:", np.asarray(goal_c)[qi])
print("occ at start:", bool(occ_hp[qi][tuple(np.asarray(start)[qi])]))
D = jax.vmap(gp.wavefront)(occ_hp, goal_c)
d_at_start = float(D[qi][tuple(np.asarray(start_r)[qi])])
print("wavefront D at recovered start:", d_at_start)
path = jax.vmap(gp.descend_path)(D, start_r)
print("path[8][:12]:", np.asarray(path)[qi][:12])
los = gp.los_free_goal(path, jnp.asarray(init_end), state.desired_goal,
                       sim.radius)
print("los_goal[8]:", np.asarray(los)[qi])
# clearance along ray from init_end to first few path points
pp = np.asarray(path)[qi]
for k in range(0, 8):
    a, b = init_end[qi], pp[k]
    t = np.linspace(0, 1, 64)[:, None]
    ray = a[None] + (b - a)[None] * t
    mc = float(np.min(np.asarray(esdf.at_points(jnp.asarray(ray)))))
    print(f"ray to path[{k}] {b}: min_clear={mc:.3f} "
          f"thr1.0={float(np.asarray(sim.radius)[qi]) + 0.5*param.world_resolution:.3f}")
