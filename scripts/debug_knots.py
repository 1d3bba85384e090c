"""Focused per-agent trace of the multi_square16 knot episodes.

Prints, for chosen agents and a cycle window, the data needed to tell a
subgoal park from a corridor wedge: position, distance-to-goal, current
subgoal and its offset from the agent, stall counter, rescue latch/phase,
and ESDF clearance at the agent.
"""
import argparse
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", default="2,13")
    ap.add_argument("--start", type=int, default=30)
    ap.add_argument("--end", type=int, default=400)
    ap.add_argument("--every", type=int, default=2)
    args = ap.parse_args()
    watch = [int(a) for a in args.agents.split(",")]

    param = Param(goal_mode=GoalMode.PRIOR_BASED, world_use_octomap=True,
                  qp_iterations=14, multisim_max_noise=0.02)
    mission = load_mission(MISSION, param, rng=np.random.default_rng(11))
    esdf = ESDF.from_bt(WORLD, mission.world_min, mission.world_max,
                        dtype=jnp.float64)
    sim = SyncSimulator(mission, param, esdf=esdf, dtype=jnp.float64)

    state = sim.initial_state()
    for it in range(args.end):
        state, info = sim._cycle_jit(state)
        state.traj.block_until_ready()
        pos = np.asarray(state.pos)
        d = np.linalg.norm(pos - np.asarray(state.desired_goal), axis=-1)
        if d.max() < param.goal_threshold:
            print(f"FINISHED at it={it}")
            break
        if it < args.start or it % args.every:
            continue
        cg = np.asarray(state.current_goal)
        rg = np.asarray(state.rescue_goal)
        ra = np.asarray(state.rescue_active)
        ph = np.asarray(state.rescue_phase)
        sc = np.asarray(state.stall_count)
        pf = np.asarray(state.path_floor)
        clr = np.asarray(esdf.at_points(jnp.asarray(pos)))
        for a in watch:
            if d[a] < param.goal_threshold:
                continue
            sub = cg[a] - pos[a]
            print(f"it={it:3d} a={a:2d} p=({pos[a][0]:6.2f},{pos[a][1]:6.2f},"
                  f"{pos[a][2]:5.2f}) d={d[a]:6.3f} "
                  f"sub=({sub[0]:5.2f},{sub[1]:5.2f},{sub[2]:5.2f})"
                  f"|{np.linalg.norm(sub):5.2f}| "
                  f"stall={sc[a]} resc={int(ra[a])}/ph{ph[a]} "
                  f"rg_off={np.linalg.norm(rg[a]-pos[a]):5.2f} "
                  f"pf_off={np.linalg.norm(pf[a]-pos[a]):5.2f} "
                  f"clr={clr[a]:5.2f}", flush=True)


if __name__ == "__main__":
    main()
