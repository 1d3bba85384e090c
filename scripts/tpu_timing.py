"""Quick TPU timing probe: per-cycle latency across swarm sizes and QP
iteration counts.  Run on the real chip (default platform)."""
import sys
import time

import numpy as np


def probe(qn, qp_iters, max_neighbors=-1, cycles=15):
    import jax.numpy as jnp
    from lsc_planner_tpu.config import Param, GoalMode
    from lsc_planner_tpu.missions import make_circle_mission
    from lsc_planner_tpu.sim.simulator import SyncSimulator
    import math
    radius = max(4.0, 0.45 * qn / math.pi)
    w = radius + 2.0
    mission = make_circle_mission(qn, radius=radius,
                                  world=(-w, -w, 0, w, w, 2.5))
    param = Param(goal_mode=GoalMode.PRIOR_BASED, qp_iterations=qp_iters,
                  max_neighbors=max_neighbors)
    sim = SyncSimulator(mission, param, dtype=jnp.float32)
    state = sim.initial_state()
    for _ in range(3):
        state, info = sim._cycle_jit(state)
    state.traj.block_until_ready()
    ts = []
    for _ in range(cycles):
        t0 = time.perf_counter()
        state, info = sim._cycle_jit(state)
        state.traj.block_until_ready()
        ts.append(time.perf_counter() - t0)
    finite = bool(np.isfinite(np.asarray(state.traj)).all())
    pres = float(np.max(np.asarray(state.primal_res)))
    print(f"qn={qn} iters={qp_iters} nbrs={max_neighbors} "
          f"p50={np.median(ts)*1e3:.1f}ms "
          f"rate={qn/np.median(ts):.0f} agents/s finite={finite} "
          f"pres={pres:.2e}", flush=True)


if __name__ == "__main__":
    for args in ((16, 14), (16, 8), (64, 14), (64, 8), (256, 10, 32),
                 (1024, 10, 32)):
        try:
            probe(*args)
        except Exception as e:
            print("FAIL", args, type(e).__name__, str(e)[:200], flush=True)
