#!/usr/bin/env python
"""Validate the IPM early-exit tolerances at 1024-agent congestion.

VERDICT r2 weak-#4: the qp_tol_gap/qp_tol_rp defaults were tuned at
16-20 agents only.  This sweep runs the 1024-agent bench configuration
(circle exchange, K=32 neighbours, the densest scene the bench claims
throughput on) across tolerance settings and records, per setting:

  * worst min inter-agent safety ratio over the run (the gate),
  * worst per-cycle QP primal residual,
  * max trajectory deviation vs the tol=0 full-cap reference run
    (solution-quality proxy; a full f64 CPU replica of 1024 agents x
    100 cycles is not tractable, and the full-cap f32 solve IS the
    asymptote the early exit approximates),
  * median cycle time (the price).

Writes docs/TOLERANCES_r03.md.
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def run_config(tol_gap, tol_rp, cycles=80, qn=1024, K=32):
    import jax
    import jax.numpy as jnp
    from lsc_planner_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from lsc_planner_tpu.config import Param, GoalMode
    from lsc_planner_tpu.missions import make_circle_mission
    from lsc_planner_tpu.sim.simulator import SyncSimulator

    radius = max(4.0, 0.45 * qn / math.pi)
    w = radius + 2.0
    mission = make_circle_mission(qn, radius=radius,
                                  world=(-w, -w, 0, w, w, 2.5))
    param = Param(goal_mode=GoalMode.PRIOR_BASED, max_neighbors=K,
                  qp_tol_gap=tol_gap, qp_tol_rp=tol_rp)
    sim = SyncSimulator(mission, param, dtype=jnp.float32)
    state = sim.initial_state()
    state, _ = sim._cycle_jit(state)        # compile
    state.traj.block_until_ready()

    trajs = []
    worst_safety = np.inf
    worst_primal = 0.0
    times = []
    for it in range(cycles):
        t0 = time.perf_counter()
        state, info = sim._cycle_jit(state)
        state.traj.block_until_ready()
        times.append(time.perf_counter() - t0)
        worst_safety = min(worst_safety, float(info.safety_step_min))
        worst_primal = max(worst_primal, float(np.max(
            np.asarray(info.primal_res))))
        if it % 10 == 0:
            trajs.append(np.asarray(state.traj))
    return {
        "tol_gap": tol_gap, "tol_rp": tol_rp,
        "min_safety": worst_safety,
        "worst_primal": worst_primal,
        "cycle_p50_ms": float(np.percentile(times, 50) * 1e3),
        "trajs": trajs,
    }


def main():
    configs = [
        (0.0, 0.0),        # full 40-iteration cap: the reference asymptote
        (1e-4, 1e-5),      # tight
        (1e-3, 1e-4),      # production default
        (1e-2, 1e-3),      # loose
    ]
    results = [run_config(g, r) for (g, r) in configs]
    ref = results[0]

    lines = [
        "# IPM early-exit tolerance validation at 1024-agent congestion",
        "",
        "1024-agent circle exchange (bench config, K=32 neighbours, f32",
        "fused Pallas IPM, cap 40 iterations), 80 cycles through peak",
        "congestion.  `traj dev` = max |traj - traj_ref| against the",
        "tol=0 full-cap run sampled every 10 cycles.",
        "",
        "| tol_gap | tol_rp | min safety | worst primal res |"
        " traj dev (m) | cycle p50 (ms) |",
        "|---|---|---|---|---|---|",
    ]
    for res in results:
        dev = max(float(np.max(np.abs(a - b)))
                  for a, b in zip(res["trajs"], ref["trajs"]))
        lines.append(
            f"| {res['tol_gap']:g} | {res['tol_rp']:g} | "
            f"{res['min_safety']:.4f} | {res['worst_primal']:.2e} | "
            f"{dev:.4f} | {res['cycle_p50_ms']:.2f} |")
    lines += [
        "",
        "Acceptance: min safety >= 1.0 (the audit gate) and primal",
        "residual within the tolerance contract.  The production default",
        "is chosen as the loosest setting whose safety margin matches the",
        "full-cap run; trajectory deviation quantifies how far the",
        "early-exit solution sits from the converged optimum (chaotic",
        "per-cycle goal-planning divergence compounds it over 80 cycles,",
        "so it bounds accumulated closed-loop drift, not per-solve",
        "error).",
        "",
    ]
    os.makedirs("docs", exist_ok=True)
    with open("docs/TOLERANCES_r03.md", "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
