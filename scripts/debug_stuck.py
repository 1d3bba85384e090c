#!/usr/bin/env python
"""Diagnose a capping-out corpus mission: who is stuck, where, and why.

Prints, every k cycles, the worst agents' distance-to-goal, current
sub-goal offset, stall counter, rescue latch, and QP primal residual --
the data needed to tell an endgame LOS/clamp park from a deadlock ring
from a solver stall.

Usage: python scripts/debug_stuck.py office/20agents/multi_random_20agents_2.json [office.bt] [--cycles 400]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lsc_planner_tpu.runtime import enable_compilation_cache
enable_compilation_cache()

import jax.numpy as jnp
import numpy as np

from lsc_planner_tpu.config import Param, GoalMode
from lsc_planner_tpu.missions import load_mission
from lsc_planner_tpu.sim.simulator import SyncSimulator

REF = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mission")
    ap.add_argument("world", nargs="?", default="")
    ap.add_argument("--cycles", type=int, default=600)
    ap.add_argument("--every", type=int, default=20)
    ap.add_argument("--tail", type=int, default=60,
                    help="print every cycle for the final k cycles")
    args = ap.parse_args()

    mpath = args.mission if os.path.exists(args.mission) else \
        f"{REF}/missions/{args.mission}"
    wpath = args.world
    if wpath and not os.path.exists(wpath):
        wpath = f"{REF}/world/{wpath}"

    param = Param(goal_mode=GoalMode.PRIOR_BASED,
                  world_use_octomap=bool(wpath))
    mission = load_mission(mpath, param, world_file_name=wpath)
    esdf = None
    if wpath:
        from lsc_planner_tpu.world.esdf import ESDF
        esdf = ESDF.from_bt(wpath, mission.world_min, mission.world_max)
    sim = SyncSimulator(mission, param, esdf=esdf, dtype=jnp.float32)

    state = sim.initial_state()
    for it in range(args.cycles):
        state, info = sim._cycle_jit(state)
        state.traj.block_until_ready()
        d = np.linalg.norm(np.asarray(state.pos - state.desired_goal),
                           axis=-1)
        if d.max() < param.goal_threshold:
            print(f"FINISHED at it={it}")
            return
        if it % args.every == 0 or it >= args.cycles - args.tail:
            stall = np.asarray(getattr(state, "stall_count",
                                       np.zeros(len(d))))
            resc = np.asarray(getattr(state, "rescue_active",
                                      np.zeros(len(d), bool)))
            pres = np.asarray(getattr(state, "primal_res",
                                      np.zeros(len(d))))
            cg = np.asarray(state.current_goal)
            pos = np.asarray(state.pos)
            far = np.argsort(d)[::-1][:3]
            rows = []
            for i in far:
                subgoal_step = np.linalg.norm(cg[i] - pos[i])
                rows.append(f"a{int(i)} d={d[i]:.3f} sub={subgoal_step:.3f}"
                            f" stall={int(stall[i])} resc={bool(resc[i])}"
                            f" rp={pres[i]:.2e}")
            print(f"it={it:3d} unfinished={(d > param.goal_threshold).sum():2d}"
                  f" safety={float(info.safety_step_min):.4f} | "
                  + " | ".join(rows), flush=True)
    print("DID NOT FINISH")
    d = np.linalg.norm(np.asarray(state.pos - state.desired_goal), axis=-1)
    for i in np.argsort(d)[::-1][:6]:
        print(f"  agent {int(i)}: pos={np.asarray(state.pos)[i].round(2)}"
              f" goal={np.asarray(state.desired_goal)[i].round(2)}"
              f" cur={np.asarray(state.current_goal)[i].round(2)}"
              f" d={d[i]:.3f}")


if __name__ == "__main__":
    main()
