#!/usr/bin/env python
"""Time the fused Pallas IPM vs the XLA path at production shapes."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lsc_planner_tpu.runtime import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from lsc_planner_tpu.config import Param
from lsc_planner_tpu.planner.optimizer import TrajOptimizer
from lsc_planner_tpu.ops import qp as qp_ops

N, C, ITERS = 1024, 38, 14


def main():
    opt = TrajOptimizer(Param())
    nv, nf, M, n1 = opt.nv, opt.nf, opt.M, opt.n + 1
    rng = np.random.default_rng(0)

    Lb = rng.normal(size=(N, nf, nf)).astype(np.float32) * 0.1
    P_blk = Lb @ np.swapaxes(Lb, -1, -2) + 5.0 * np.eye(nf,
                                                        dtype=np.float32)
    P = np.zeros((N, nv, nv), np.float32)
    for k in range(3):
        P[:, k * nf:(k + 1) * nf, k * nf:(k + 1) * nf] = P_blk
    q = rng.normal(size=(N, nv)).astype(np.float32)
    b_st = (rng.normal(size=(N, opt.A_static_y.shape[0])) - 8.0).astype(
        np.float32)
    normal = rng.normal(size=(N, C, M, 3)).astype(np.float32)
    rhs = (rng.normal(size=(N, C, M, n1)) - 8.0).astype(np.float32)
    mask = rng.uniform(size=(N, C, M, n1)) > 0.2
    y0 = (rng.normal(size=(N, nv)) * 0.1).astype(np.float32)

    common = [jnp.asarray(P), jnp.asarray(q), jnp.asarray(opt.A_static_y),
              jnp.asarray(b_st), jnp.asarray(normal), jnp.asarray(rhs),
              jnp.asarray(mask), jnp.asarray(opt.F_seg.astype(np.float32))]
    kw = dict(y0=jnp.asarray(y0), iters=ITERS,
              static_blocks=opt.static_blocked)

    for label, extra in (
            ("xla factored path", dict(fused_mode="off")),
            ("fused pallas ipm", dict(P_blk=jnp.asarray(P_blk),
                                      fused_mode="auto"))):
        fn = jax.jit(lambda *a, _e=extra: qp_ops.solve_qp_lsc(
            *a, **kw, **_e))
        sol = fn(*common)
        sol.y.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(10):
            sol = fn(*common)
        sol.y.block_until_ready()
        dt = (time.perf_counter() - t0) / 10
        print(f"{label:24s} {dt*1e3:8.2f} ms  ({dt/ITERS*1e3:.3f} ms/it)"
              f"  pres={float(jnp.max(sol.primal_res)):.2e}"
              f"  gap={float(jnp.max(sol.gap)):.2e}"
              f"  finite={bool(jnp.isfinite(sol.y).all())}", flush=True)


if __name__ == "__main__":
    main()
