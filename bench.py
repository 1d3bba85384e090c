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

ONE SOLVER CONFIG: every size runs the framework DEFAULT solver
(cap 40 + exit triple + step-collapse latch + 1 Gondzio corrector) --
the same config scripts/run_corpus.py validates end-to-end.  The
round-4 bench/corpus cap split (10 vs 40) is gone: per-lane exits and
the f32 fixed-point latch make the cap self-limiting (measured 20-30
iterations at the deepest 1024-agent congestion, fewer elsewhere).

SELF-GATING: BASELINE.md's condition is throughput at the same 100 %
success rate.  Each size and each measurement method reports its own
min inter-agent safety ratio (device audit, sim/audit.py); if the
headline configuration records min_safety < 1.0 the run is a FAILURE
and vs_baseline is reported as 0.  The audit itself is proven exact-f32
on the real backend once per run (audit.precision_self_check) before
any of those numbers are believed.

Per size, THREE latency/throughput views measured from the SAME
early-congestion snapshot (so all methods time the same mission phase),
plus one steady-phase fused measurement:
  cycle_p50/p99_ms        blocking dispatch latency (includes the remote
                          TPU tunnel RTT, ~25 ms on this host)
  pipelined_*             back-to-back dispatches, queue kept full
  fused_*                 k cycles per dispatch via lax.scan
  fused_steady_*          the same fused measurement taken AFTER the
                          crossing resolves (cruising swarm) -- the
                          phase round-2 measured, quantifying how much
                          of the r2->r4 small-swarm delta was bench
                          methodology rather than regression
The headline picks the best same-phase method and names it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import math
import time

import numpy as np

BASELINE_AGENT_CYCLES_PER_S = 1.0 / 0.00947   # reference CPLEX single-core


def bench_size(qn: int, cycles: int = 30, warmup: int = 10,
               max_neighbors: int = -1, fuse: int = 10,
               steady_cycles: int = 60):
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
    param = Param(goal_mode=GoalMode.PRIOR_BASED,
                  max_neighbors=max_neighbors)
    sim = SyncSimulator(mission, param, dtype=jnp.float32)
    state = sim.initial_state()
    # warmup + compile, into the early-congestion phase; the blocking /
    # pipelined / fused measurements below all restart from this
    # snapshot so they time the SAME mission phase
    for _ in range(warmup):
        state, info = sim._cycle_jit(state)
    state.traj.block_until_ready()
    snapshot = state
    safety0 = float(state.safety_agent_min)

    def run_blocking(st):
        times = []
        overflow = 0
        for _ in range(cycles):
            t0 = time.perf_counter()
            st, info = sim._cycle_jit(st)
            st.traj.block_until_ready()
            times.append(time.perf_counter() - t0)
            if getattr(info, "knn_overflow", None) is not None:
                overflow = max(overflow, int(np.asarray(
                    info.knn_overflow).sum()))
        return st, np.asarray(times), overflow

    state_b, times, knn_overflow_max = run_blocking(snapshot)
    safety_blocking = float(state_b.safety_agent_min)

    # pipelined throughput: back-to-back receding-horizon cycles with the
    # dispatch queue kept full (blocking once at the end).  Per-cycle
    # block_until_ready above measures the remote-tunnel RTT (~25-50 ms),
    # not the device; production serving pipelines cycles exactly like
    # this.
    reps = min(40, cycles)
    st = snapshot
    t0 = time.perf_counter()
    for _ in range(reps):
        st, _ = sim._cycle_jit(st)
    st.traj.block_until_ready()
    pipelined = (time.perf_counter() - t0) / reps
    safety_pipelined = float(st.safety_agent_min)

    # fused: `fuse` cycles per device dispatch (lax.scan) -- amortizes
    # per-dispatch host work on top of pipelining.
    multi = sim.make_scan_cycle(fuse)
    st, _ = multi(snapshot)       # compile + warm
    st.traj.block_until_ready()
    ftimes = []
    for _ in range(3):
        t0 = time.perf_counter()
        st, _ = multi(st)
        st.traj.block_until_ready()
        ftimes.append((time.perf_counter() - t0) / fuse)
    fused = float(np.median(ftimes))
    safety_fused = float(st.safety_agent_min)

    # steady-phase fused: advance past the crossing, then re-measure --
    # the phase the round-2 bench measured
    st = state_b
    for _ in range(steady_cycles):
        st, _ = sim._cycle_jit(st)
    st.traj.block_until_ready()
    st, _ = multi(st)
    st.traj.block_until_ready()
    stimes = []
    for _ in range(3):
        t0 = time.perf_counter()
        st, _ = multi(st)
        st.traj.block_until_ready()
        stimes.append((time.perf_counter() - t0) / fuse)
    fused_steady = float(np.median(stimes))
    safety_steady = float(st.safety_agent_min)

    finite = bool(np.isfinite(np.asarray(st.pos)).all())
    min_safety = min(safety_blocking, safety_pipelined, safety_fused,
                     safety_steady)
    return {
        "qn": qn,
        "cycle_p50_ms": float(np.percentile(times, 50) * 1e3),
        "cycle_p99_ms": float(np.percentile(times, 99) * 1e3),
        "agent_cycles_per_s": float(qn / np.median(times)),
        "pipelined_cycle_ms": pipelined * 1e3,
        "pipelined_agent_cycles_per_s": float(qn / pipelined),
        "fused_cycle_ms": fused * 1e3,
        "fused_agent_cycles_per_s": float(qn / fused),
        "fused_steady_cycle_ms": fused_steady * 1e3,
        "fused_steady_agent_cycles_per_s": float(qn / fused_steady),
        "steps_per_dispatch": fuse,
        "max_neighbors": max_neighbors,
        "solver_config": "default (cap 40, exit triple + step latch, "
                         "1 corrector)",
        "qp_kernel": ("pallas-fused" if qn >= 128 else "xla-factored"),
        "knn_overflow_max": knn_overflow_max,
        "finite": finite,
        "min_safety_warmup": safety0,
        "min_safety_blocking": safety_blocking,
        "min_safety_pipelined": safety_pipelined,
        "min_safety_fused": safety_fused,
        "min_safety_fused_steady": safety_steady,
        "min_safety": min_safety,
        "success": finite and min_safety >= 1.0,
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
    for qn, nbrs in ((16, -1), (64, -1), (1024, 32)):
        try:
            results[str(qn)] = bench_size(qn, max_neighbors=nbrs)
        except Exception as e:  # keep the bench robust: report what ran
            results[str(qn)] = {"error": f"{type(e).__name__}: {e}"}
    _emit(results)


if __name__ == "__main__":
    main()
