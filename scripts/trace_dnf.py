#!/usr/bin/env python
"""Trace corpus DNF (cap-out) missions: where does each parked agent sit?

For every unfinished row of a corpus CSV, re-runs the mission on the
requested platform and reports, every `--every` cycles and at the end,
the unfinished agents' distance-to-goal, stall counter, rescue state,
and (octomap worlds) static clearance -- enough to classify an endgame
hover vs a pocket wedge vs a crowd livelock.
"""
import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from scripts.audit_continuous import mission_path  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default="results/corpus_r05.csv")
    ap.add_argument("--platform", default="")
    ap.add_argument("--cycles", type=int, default=600)
    ap.add_argument("--every", type=int, default=100)
    ap.add_argument("--only", default="",
                    help="substring filter on mission name")
    args = ap.parse_args()

    import jax
    from lsc_planner_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    from lsc_planner_tpu.config import Param, GoalMode
    from lsc_planner_tpu.missions import load_mission
    from lsc_planner_tpu.sim.simulator import SyncSimulator

    targets = [r for r in csv.DictReader(open(args.csv))
               if r["finished"] != "True" and not r["error"]]
    if args.only:
        targets = [r for r in targets if args.only in r["mission"]]
    for r in targets:
        mpath, wpath = mission_path(r["scenario"], r["mission"],
                                    r.get("world") or None)
        p = Param(goal_mode=GoalMode.PRIOR_BASED,
                  world_use_octomap=bool(wpath))
        mission = load_mission(mpath, p, world_file_name=wpath or "")
        esdf = None
        if wpath:
            from lsc_planner_tpu.world.esdf import ESDF
            esdf = ESDF.from_bt(wpath, mission.world_min,
                                mission.world_max)
        sim = SyncSimulator(mission, p, esdf=esdf, dtype=jnp.float32)
        state = sim.initial_state()
        print(f"=== {r['scenario']}/{r['mission']} ===", flush=True)
        for it in range(args.cycles):
            state, _ = sim._cycle_jit(state)
            state.traj.block_until_ready()
            d = np.linalg.norm(
                np.asarray(state.pos - state.desired_goal), axis=-1)
            if d.max() < p.goal_threshold:
                print(f"  FINISHED at it={it}", flush=True)
                break
            if it % args.every == 0 or it == args.cycles - 1:
                sc = np.asarray(state.stall_count)
                ra = np.asarray(state.rescue_active)
                ph = np.asarray(state.rescue_phase)
                far = np.argsort(d)[::-1]
                far = [i for i in far if d[i] > p.goal_threshold][:4]
                info = []
                for i in far:
                    e = ""
                    if esdf is not None:
                        e = f" clr={float(esdf.at_points(jnp.asarray(state.pos[i]))):.2f}"
                    info.append(f"a{i}:d={d[i]:.3f} st={sc[i]} "
                                f"r={int(ra[i])}/p{ph[i]}{e}")
                print(f"  it={it:3d} unfin="
                      f"{(d > p.goal_threshold).sum()} " + "  ".join(info),
                      flush=True)


if __name__ == "__main__":
    main()
