#!/usr/bin/env python
"""Ablation timing of the fused 1024-agent cycle: vary qp/hull iteration
counts to attribute the cycle time to IPM vs hull closest-point work."""
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lsc_planner_tpu.runtime import enable_compilation_cache
enable_compilation_cache()

import jax.numpy as jnp
import numpy as np

from lsc_planner_tpu.config import Param, GoalMode
from lsc_planner_tpu.missions import make_circle_mission
from lsc_planner_tpu.sim.simulator import SyncSimulator


def run(qp_iters, hull_iters, fuse=10):
    qn = 1024
    radius = max(4.0, 0.45 * qn / math.pi)
    w = radius + 2.0
    mission = make_circle_mission(qn, radius=radius,
                                  world=(-w, -w, 0, w, w, 2.5))
    param = Param(goal_mode=GoalMode.PRIOR_BASED, qp_iterations=qp_iters,
                  max_neighbors=32, hull_iterations=hull_iters)
    sim = SyncSimulator(mission, param, dtype=jnp.float32)
    multi = sim.make_scan_cycle(fuse)
    state = sim.initial_state()
    state, _ = multi(state)
    state.traj.block_until_ready()
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        state, _ = multi(state)
        state.traj.block_until_ready()
        ts.append((time.perf_counter() - t0) / fuse)
    ms = float(np.median(ts)) * 1e3
    print(f"qp_iters={qp_iters:3d} hull_iters={hull_iters:3d} "
          f"cycle={ms:7.2f} ms", flush=True)
    return ms


def main():
    base = run(14, 96)
    qp4 = run(4, 96)
    hull16 = run(14, 16)
    print(f"IPM per-iteration : {(base - qp4) / 10:.3f} ms")
    print(f"hull per-iteration: {(base - hull16) / 80:.4f} ms")
    print(f"residual (non-QP, non-hull): "
          f"{base - 14 * (base - qp4) / 10 - 96 * (base - hull16) / 80:.2f}"
          " ms")


if __name__ == "__main__":
    main()
