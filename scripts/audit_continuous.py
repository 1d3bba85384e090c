#!/usr/bin/env python
"""Continuous-time safety audit over the worst-margin corpus rows.

The per-cycle device audit (and the reference's,
multi_sync_simulator.cpp:446-503) SAMPLES trajectories at
record_time_step; corpus rows with min_safety within a few ulp of 1.0
could hide an inter-sample near-miss.  This driver re-runs the
worst-margin finished missions from a corpus CSV and applies the
root-isolation curve-pair audit (sim/audit.py continuous_safety_ratio,
the exact-in-time strengthening of the sampled check) to EVERY cycle's
committed trajectories.

Usage:
  python scripts/audit_continuous.py --csv results/corpus_r04.csv \
      --worst 12 --platform cpu
"""
import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REF = "/root/reference"


def mission_path(scenario, mission, world):
    if scenario == "named":
        return f"{REF}/missions/{mission}", world or None
    sub = {"empty": "empty", "forest": "forest", "office": "office"}[
        scenario]
    qn = mission.split("agents")[0].split("_")[-1]
    # "0816/<name>.json" rows live in the archived 50-agent subdir
    m = f"{REF}/missions/{sub}/{qn}agents/{mission}"
    if scenario == "office":
        return m, f"{REF}/world/office.bt"
    if scenario == "forest":
        # forest worlds are paired lexicographically in run_corpus
        import glob
        ms = sorted(glob.glob(f"{REF}/missions/forest/**/*.json",
                              recursive=True))
        ws = sorted(glob.glob(f"{REF}/world/forest/**/*.bt",
                              recursive=True))
        idx = [os.path.basename(x) for x in ms].index(mission)
        return m, ws[idx]
    return m, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default="results/corpus_r04.csv")
    ap.add_argument("--worst", type=int, default=12)
    ap.add_argument("--platform", default="")
    ap.add_argument("--max-iterations", type=int, default=600)
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
    from lsc_planner_tpu.sim import audit

    rows = []
    with open(args.csv) as f:
        for r in csv.DictReader(f):
            if r["finished"] == "True" and not r["error"]:
                rows.append(r)
    rows.sort(key=lambda r: float(r["min_safety"]))
    targets = rows[:args.worst]

    cont_audit = jax.jit(audit.continuous_safety_ratio)
    out = []
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
        cmin = np.inf
        for c in range(args.max_iterations):
            state, _ = sim._cycle_jit(state)
            cmin = min(cmin, float(cont_audit(state.traj, sim.radius,
                                              sim.downwash)))
            if sim.is_finished(state):
                break
        row = {"scenario": r["scenario"], "mission": r["mission"],
               "sampled_min_safety": float(r["min_safety"]),
               "continuous_min_safety": round(cmin, 6),
               "cycles": c + 1,
               "finished": bool(sim.is_finished(state))}
        out.append(row)
        print(json.dumps(row), flush=True)

    worst = min((r["continuous_min_safety"] for r in out), default=np.inf)
    tag = os.path.basename(args.csv).replace("corpus_", "").replace(
        ".csv", "")
    md = ["# Continuous-time audit — worst-margin corpus rows",
          "",
          "Root-isolation curve-pair minimum distance applied to every "
          "cycle's committed trajectories (sim/audit.py "
          "continuous_safety_ratio) for the lowest-sampled-margin "
          f"missions of `{args.csv}`.",
          "",
          "| scenario | mission | sampled min | continuous min | cycles |",
          "|---|---|---|---|---|"]
    for r in out:
        md.append(f"| {r['scenario']} | {r['mission']} | "
                  f"{r['sampled_min_safety']:.4f} | "
                  f"{r['continuous_min_safety']:.4f} | {r['cycles']} |")
    md.append("")
    md.append(f"Worst continuous-time ratio: **{worst:.4f}** "
              f"({'no' if worst >= 1.0 else 'CONTINUOUS-TIME'} "
              "inter-sample collision).")
    with open(f"results/CONTINUOUS_{tag}.md", "w") as f:
        f.write("\n".join(md) + "\n")
    with open(f"results/audit_continuous_{tag}.csv", "w",
              newline="") as f:
        wr = csv.DictWriter(f, list(out[0].keys()) if out else
                            ["scenario", "mission"])
        wr.writeheader()
        wr.writerows(out)
    print(f"wrote results/CONTINUOUS_{tag}.md; worst={worst:.4f}")


if __name__ == "__main__":
    main()
