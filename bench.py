#!/usr/bin/env python
"""Benchmark: batched planning-cycle throughput on one TPU chip.

Headline metric: QP solves (= agent planning cycles) per second per chip,
measured on full synchronous LSC replanning cycles (prediction -> priority
goals -> LSC construction -> batched QP -> safety audit), at swarm sizes
16 / 64 / 1024.

Baseline: the reference plans one agent in 9.47 ms on a desktop CPU core
with CPLEX (avg over multi_square16, /root/reference/log/
summary_LSC_16agents.csv), i.e. ~105.6 agent-cycles/s/core.
vs_baseline = our agent-cycles/s/chip divided by that.

SELF-GATING: BASELINE.md's condition is throughput at the same 100 %
success rate.  Each size reports its own min inter-agent safety ratio
(device audit, sim/audit.py); if the headline configuration records
min_safety < 1.0 the run is a FAILURE and vs_baseline is reported as 0.

Three latency/throughput views per size, reported separately:
  cycle_p50/p99_ms        blocking dispatch latency (includes the remote
                          TPU tunnel RTT, ~25 ms on this host)
  pipelined_*             back-to-back dispatches, queue kept full
  fused_*                 k cycles per dispatch via lax.scan
The headline picks the best method and names it (headline_method).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import math
import time

import numpy as np

BASELINE_AGENT_CYCLES_PER_S = 1.0 / 0.00947   # reference CPLEX single-core


def bench_size(qn: int, cycles: int = 30, warmup: int = 10,
               max_neighbors: int = -1, fuse: int = 10,
               qp_iterations: int = None):
    import jax
    from lsc_planner_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from lsc_planner_tpu.config import Param, GoalMode
    from lsc_planner_tpu.missions import make_circle_mission
    from lsc_planner_tpu.sim.simulator import SyncSimulator

    radius = max(4.0, 0.45 * qn / math.pi)     # keep ~0.9 m arc spacing
    w = radius + 2.0
    mission = make_circle_mission(qn, radius=radius,
                                  world=(-w, -w, 0, w, w, 2.5))
    kw = {} if qp_iterations is None else {"qp_iterations": qp_iterations}
    param = Param(goal_mode=GoalMode.PRIOR_BASED,
                  max_neighbors=max_neighbors, **kw)
    sim = SyncSimulator(mission, param, dtype=jnp.float32)
    state = sim.initial_state()
    # warmup + compile, into the early-congestion phase; EVERY
    # measurement below restarts from this snapshot so blocking /
    # pipelined / fused all time the SAME mission phase (measuring them
    # back-to-back lets the swarm reach its goals mid-bench and the last
    # method times a parked swarm's trivially-converged QPs)
    for _ in range(warmup):
        state, info = sim._cycle_jit(state)
    state.traj.block_until_ready()
    snapshot = state

    times = []
    knn_overflow_max = 0
    for _ in range(cycles):
        t0 = time.perf_counter()
        state, info = sim._cycle_jit(state)
        state.traj.block_until_ready()
        times.append(time.perf_counter() - t0)
        if getattr(info, "knn_overflow", None) is not None:
            knn_overflow_max = max(knn_overflow_max, int(np.asarray(
                info.knn_overflow).sum()))
    times = np.asarray(times)
    min_safety = float(state.safety_agent_min)
    ok = bool(np.isfinite(np.asarray(state.pos)).all())

    # pipelined throughput: back-to-back receding-horizon cycles with the
    # dispatch queue kept full (blocking once at the end).  Per-cycle
    # block_until_ready above measures the remote-tunnel RTT (~25-50 ms),
    # not the device; production serving pipelines cycles exactly like
    # this.
    reps = min(40, cycles)
    state2 = snapshot
    t0 = time.perf_counter()
    for _ in range(reps):
        state2, _ = sim._cycle_jit(state2)
    state2.traj.block_until_ready()
    pipelined = (time.perf_counter() - t0) / reps
    min_safety = min(min_safety, float(state2.safety_agent_min))

    # fused: `fuse` cycles per device dispatch (lax.scan) -- amortizes
    # per-dispatch host work on top of pipelining.  Reported SEPARATELY
    # from the pipelined number (different measurement methodologies).
    multi = sim.make_scan_cycle(fuse)
    state3, _ = multi(snapshot)       # compile + warm
    state3.traj.block_until_ready()
    ftimes = []
    for _ in range(3):
        t0 = time.perf_counter()
        state3, _ = multi(state3)
        state3.traj.block_until_ready()
        ftimes.append((time.perf_counter() - t0) / fuse)
    fused = float(np.median(ftimes))
    min_safety = min(min_safety, float(state3.safety_agent_min))
    ok = ok and bool(np.isfinite(np.asarray(state3.pos)).all())
    return {
        "qn": qn,
        "cycle_p50_ms": float(np.percentile(times, 50) * 1e3),
        "cycle_p99_ms": float(np.percentile(times, 99) * 1e3),
        "agent_cycles_per_s": float(qn / np.median(times)),
        "pipelined_cycle_ms": pipelined * 1e3,
        "pipelined_agent_cycles_per_s": float(qn / pipelined),
        "fused_cycle_ms": fused * 1e3,
        "fused_agent_cycles_per_s": float(qn / fused),
        "steps_per_dispatch": fuse,
        "max_neighbors": max_neighbors,
        "qp_iterations": qp_iterations or "default",
        "knn_overflow_max": knn_overflow_max,
        "finite": ok,
        "min_safety": min_safety,
        "success": ok and min_safety >= 1.0,
    }


def _emit(results):
    headline = None
    for key in ("1024", "64", "16"):
        r = results.get(key, {})
        if "agent_cycles_per_s" in r:
            headline = r
            break
    value = 0.0
    method = "none"
    if headline:
        candidates = [
            ("pipelined_dispatch",
             headline.get("pipelined_agent_cycles_per_s", 0.0)),
            ("fused_scan",
             headline.get("fused_agent_cycles_per_s", 0.0)),
            ("blocking", headline.get("agent_cycles_per_s", 0.0)),
        ]
        method, value = max(candidates, key=lambda kv: kv[1])
    # BASELINE.md condition: throughput at the same 100 % success rate.
    # A collision in the audit voids the throughput claim entirely.
    success = bool(headline and headline.get("success", False))
    out = {
        "metric": f"QP solves/s/chip ({headline['qn']} agents, full LSC "
                  f"cycle)" if headline else "QP solves/s/chip",
        "value": round(value, 1),
        "unit": "agent-cycles/s",
        "vs_baseline": (round(value / BASELINE_AGENT_CYCLES_PER_S, 2)
                        if success else 0.0),
        "headline_method": method,
        "success": success,
        "detail": results,
    }
    if not success and headline:
        out["note"] = (f"GATED: min_safety="
                       f"{headline.get('min_safety')} < 1.0 voids the "
                       "vs_baseline claim (BASELINE.md success condition)")
    print(json.dumps(out), flush=True)


def main():
    import signal
    results = {}

    def on_term(signum, frame):
        # remote TPU compiles can take minutes per configuration; if the
        # harness times us out, still emit whatever completed
        results.setdefault("note", "terminated early")
        _emit(results)
        raise SystemExit(0)

    signal.signal(signal.SIGTERM, on_term)
    # Audit-trustworthiness gate (round-4 regression): prove on the REAL
    # backend that positions_at is exact f32 at large coordinates before
    # any min_safety below is believed.  Raises (bench fails loudly)
    # rather than silently reporting phantom safety numbers.
    from lsc_planner_tpu.sim import audit as _audit
    results["audit_precision_err_m"] = _audit.precision_self_check()
    # Per-scenario solver caps: the framework default (40 + early exit
    # + 1 Gondzio corrector) is what the corpus validates end-to-end;
    # the benched circle exchanges are AUDIT-VALIDATED safe at cap 14
    # across rounds (min safety 1.01-1.14 at every size) and the
    # self-gate below voids the claim if that ever regresses.  Why the
    # bifurcation persists (docs/TOLERANCES_r04.md): in f32 the
    # cancellation floor of the dual residual at congested swarm scales
    # sits above any sound exit tolerance, so the exit deliberately
    # does not fire there and the cap is the honest cost knob.  Cap 10
    # WITH the default Gondzio corrector costs the same as r3's
    # corrector-less cap 14 (+37 %/iteration) and converges strictly
    # better (the r3 gap plateau is gone at 10 iterations; circle20
    # endgame quality is identical at caps 10/14/20/40).
    for qn, nbrs, iters in ((16, -1, 10), (64, -1, 10),
                            (1024, 32, 10)):
        try:
            results[str(qn)] = bench_size(qn, max_neighbors=nbrs,
                                          qp_iterations=iters)
        except Exception as e:  # keep the bench robust: report what ran
            results[str(qn)] = {"error": f"{type(e).__name__}: {e}"}
    _emit(results)


if __name__ == "__main__":
    main()
