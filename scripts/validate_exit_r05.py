#!/usr/bin/env python
"""Does the IPM early exit fire at 1024-agent congestion after the
delta-coordinate reformulation?  (VERDICT r4 next-#6)

Round 4's finding (docs/TOLERANCES_r04.md section 3): evaluating the dual
residual r_d = P y + q - A'lam in f32 at world-coordinate magnitudes
(sigma |y| ~ 1e7) has a cancellation floor ~0.4 -- 8x ABOVE qp_tol_rd
(0.05) -- so the exit triple could never fire at congested swarm scales
and the iteration cap had to govern cost (bench cap 10/14 vs corpus cap
40).  Round 5 reformulates every warm-started solve in delta coordinates
d = y - y0 (ops/qp.py solve_qp_lsc): iterates no longer carry the ~150 m
coordinate magnitudes, P@d terms are ~1e3, and the r_d noise floor drops
~100x below tol_rd.

This script drives the 1024-agent bench scene through its congestion
phase ON THE DEFAULT SOLVER CONFIG (cap 40 + exit triple + 1 Gondzio
corrector) and records, per probed cycle, the per-tile IPM iterations
consumed (QPSolution.iters).  Exit fired <=> iters < cap.  Also records
safety + cycle time so the collapsed bench/corpus config split can be
justified.  Writes docs/TOLERANCES_r05.md.
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main(qn=1024, K=32, cycles=100, probe_every=5):
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
    param = Param(goal_mode=GoalMode.PRIOR_BASED, max_neighbors=K)
    sim = SyncSimulator(mission, param, dtype=jnp.float32)
    state = sim.initial_state()
    state, _ = sim._cycle_jit(state)
    state.traj.block_until_ready()

    rows = []
    times = []
    min_safety = np.inf
    for cyc in range(cycles):
        t0 = time.perf_counter()
        state, info = sim._cycle_jit(state)
        state.traj.block_until_ready()
        times.append(time.perf_counter() - t0)
        min_safety = min(min_safety, float(info.safety_step_min))
        if cyc % probe_every == 0:
            it_arr = np.asarray(info.qp_iters) \
                if getattr(info, "qp_iters", None) is not None else None
            rows.append((cyc, it_arr,
                         float(np.max(np.asarray(info.primal_res))),
                         float(np.max(np.asarray(info.qp_gap))
                               if getattr(info, "qp_gap", None) is not None
                               else np.nan)))
    cap = param.qp_iterations
    lines = [
        "# TOLERANCES r05 -- the early exit at 1024-agent congestion",
        "",
        f"1024-agent circle exchange (bench scene, K={K} neighbours),",
        f"DEFAULT solver config: cap {cap}, exit triple (tol_gap="
        f"{param.qp_tol_gap:g} rel, tol_rp={param.qp_tol_rp:g}, tol_rd="
        f"{param.qp_tol_rd:g} abs), {param.qp_correctors} Gondzio "
        "corrector, f32 fused Pallas IPM, delta-coordinate formulation.",
        "",
        "Per probed cycle: IPM iterations consumed per 128-agent lane",
        "tile (max over tiles).  `iters < cap` = the exit FIRED.",
        "",
        "| cycle | tile iters (min/med/max) | worst primal res |",
        "|---|---|---|",
    ]
    fired = 0
    for cyc, it_arr, pres, gap in rows:
        if it_arr is None:
            lines.append(f"| {cyc} | (not recorded) | {pres:.2e} |")
            continue
        mn, md, mx = (int(np.min(it_arr)), float(np.median(it_arr)),
                      int(np.max(it_arr)))
        fired += int(mx < cap)
        lines.append(f"| {cyc} | {mn}/{md:.0f}/{mx} | {pres:.2e} |")
    lines += [
        "",
        f"min safety over {cycles} cycles: {min_safety:.4f}",
        f"cycle p50: {np.percentile(times, 50)*1e3:.2f} ms, "
        f"p99: {np.percentile(times, 99)*1e3:.2f} ms",
        f"probes with exit fired (max tile iters < cap): {fired}/"
        f"{len(rows)}",
        "",
    ]
    out = "\n".join(lines)
    print(out)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "TOLERANCES_r05.md"),
            "w") as f:
        f.write(out)


if __name__ == "__main__":
    main()
