#!/usr/bin/env python
"""Op-level trace of the fused 10-cycle dispatch at 1024 agents.

Writes a jax.profiler trace and prints the top device ops by self time
(parsed from the .xplane.pb via tensorflow's profiler proto if available,
else just leaves the trace dir for manual inspection).
"""
import glob
import gzip
import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lsc_planner_tpu.runtime import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from lsc_planner_tpu.config import Param, GoalMode
from lsc_planner_tpu.missions import make_circle_mission
from lsc_planner_tpu.sim.simulator import SyncSimulator

TRACE_DIR = "/tmp/lsc_trace"


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
    state, _ = multi(state)            # compile + warm
    state.traj.block_until_ready()

    jax.profiler.start_trace(TRACE_DIR)
    state, _ = multi(state)
    state.traj.block_until_ready()
    jax.profiler.stop_trace()

    files = glob.glob(TRACE_DIR + "/**/*.xplane.pb", recursive=True)
    print("trace files:", files)
    files2 = glob.glob(TRACE_DIR + "/**/*.trace.json.gz", recursive=True)
    for f in files2:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        evs = [e for e in data.get("traceEvents", [])
               if e.get("ph") == "X" and "dur" in e]
        # keep device-side lanes only (heuristic: pid names containing TPU)
        agg = {}
        for e in evs:
            name = e["name"]
            agg[name] = agg.get(name, 0.0) + e["dur"]
        top = sorted(agg.items(), key=lambda kv: -kv[1])[:60]
        total = sum(agg.values())
        print(f"== {f}: total {total/1e3:.2f} ms")
        for name, dur in top:
            print(f"  {dur/1e3:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
