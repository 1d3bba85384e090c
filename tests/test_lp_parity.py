"""Reference QP parity against the CPLEX model export.

``/root/reference/log/QPmodel.lp`` is the reference's OWN assembled QP,
written by CPLEX (``traj_optimizer.cpp:62-69, 99-102``): every objective
coefficient, equality row, inequality row, and variable bound of one real
``TrajOptimizer::solve`` instance.  Parsing it and diffing against our
assembly is the strongest reference cross-check possible without running
CPLEX (BASELINE.md tolerance contract).

The dump is from the FAILURE path (the sibling ``conflict.lp`` is its
refined infeasible subset), and scipy/HiGHS confirms the instance is
infeasible -- so the solve-level checks here are (a) the solver stays
bounded and reports the infeasibility through ``primal_res`` (the
QPFAILED contract), and (b) a feasible relaxation solves to KKT
optimality, cross-checked against scipy.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from lsc_planner_tpu.config import Param
from lsc_planner_tpu.planner.optimizer import TrajOptimizer
from lsc_planner_tpu.sim.lpfile import parse_lp, bounds_as_rows
from lsc_planner_tpu.ops import qp as qp_ops

LP_PATH = "/root/reference/log/QPmodel.lp"

# agent state recovered from the dump's initial-state equality rows
# (c1-c3 / c16-c18 / c31-c33: p0 with v0 = a0 = 0)
P0 = np.array([-0.197720006108284, -1.42369997501373, 0.699999988079071])
# goal recovered from the linear terms  -2 w_t g_k  on the terminal
# endpoints of segments {3, 4}  (terminal_segments = 2)
GOAL = np.array([0.298219323158264, -1.48729395866394, 0.699999988079071])
TERM_SEGS = (3, 4)
W_CI, W_T = 0.01, 1.0


@pytest.fixture(scope="module")
def lp():
    return parse_lp(LP_PATH)


@pytest.fixture(scope="module")
def opt():
    return TrajOptimizer(Param())


def test_objective_parity(lp, opt):
    """Our jerk Gram + terminal-weight assembly reproduces every CPLEX
    objective coefficient (buildQBase traj_optimizer.cpp:169-184 +
    terminal cost :354-372)."""
    n, nvx = opt.n, opt.F.shape[0]
    E = np.zeros((nvx, nvx))
    for m in TERM_SEGS:
        idx = m * (n + 1) + n
        E[idx, idx] = 1.0
    P_dim = 2 * W_CI * np.asarray(opt.Q_full) + 2 * W_T * E

    for k in range(3):
        blk = lp.P[k * nvx:(k + 1) * nvx, k * nvx:(k + 1) * nvx]
        rel = np.abs(blk - P_dim).max() / np.abs(P_dim).max()
        assert rel < 1e-9, f"P dim {k} mismatch {rel}"
    # dims are uncoupled in the reference objective
    assert np.abs(lp.P[:nvx, nvx:]).max() == 0.0

    q_ours = np.zeros_like(lp.q)
    for k in range(3):
        for m in TERM_SEGS:
            q_ours[k * nvx + m * (n + 1) + n] = -2 * W_T * GOAL[k]
    np.testing.assert_allclose(lp.q, q_ours, atol=1e-12)
    # objective constant = w_t sum_m |g|^2
    np.testing.assert_allclose(lp.c, W_T * len(TERM_SEGS) *
                               np.sum(GOAL ** 2), rtol=1e-9)


def test_equality_parity(lp, opt):
    """Our equality-eliminated parameterization x = F y + G s0 spans
    exactly the reference's equality set (initial state + C^2 continuity
    + stop-at-horizon, buildAeqBase :186-236 + :529-536): A_eq F = 0 and
    A_eq G s0 = b_eq."""
    F3 = np.kron(np.eye(3), np.asarray(opt.F))
    G3 = np.kron(np.eye(3), np.asarray(opt.G))
    s0 = np.zeros(9)
    s0[0::3] = P0                      # (p0, v0=0, a0=0) per dim
    assert np.abs(lp.A_eq @ F3).max() < 1e-10
    np.testing.assert_allclose(lp.A_eq @ (G3 @ s0), lp.b_eq, atol=1e-12)
    # rank: 17 eliminated per dim -> 13 free
    assert np.linalg.matrix_rank(lp.A_eq) == 51
    assert opt.nf == 13


def _reduced(lp, opt):
    F3 = np.kron(np.eye(3), np.asarray(opt.F))
    G3 = np.kron(np.eye(3), np.asarray(opt.G))
    s0 = np.zeros(9)
    s0[0::3] = P0
    x0 = G3 @ s0
    Ab, bb = bounds_as_rows(lp)
    A_all = np.vstack([lp.A_in, Ab])
    b_all = np.concatenate([lp.b_in, bb])
    return (F3.T @ lp.P @ F3, F3.T @ (lp.P @ x0 + lp.q),
            A_all @ F3, b_all - A_all @ x0, F3, x0)


def test_infeasible_dump_surfaces_qpfailed(lp, opt):
    """The dump is the reference's failure export (conflict.lp sibling);
    our IPM must stay bounded and report the infeasibility via
    primal_res (the QPFAILED contract, traj_optimizer.cpp:99-144)."""
    from scipy.optimize import linprog
    NV = lp.P.shape[0]
    feas = linprog(
        c=np.zeros(NV), A_ub=-lp.A_in, b_ub=-lp.b_in,
        A_eq=lp.A_eq, b_eq=lp.b_eq,
        bounds=list(zip(np.where(np.isfinite(lp.lo), lp.lo, None),
                        np.where(np.isfinite(lp.hi), lp.hi, None))),
        method="highs")
    assert feas.status == 2, "dump unexpectedly feasible"

    P_r, q_r, A_r, b_r, _, _ = _reduced(lp, opt)
    sol = qp_ops.solve_qp(jnp.asarray(P_r[None]), jnp.asarray(q_r[None]),
                          jnp.asarray(A_r[None]), jnp.asarray(b_r[None]),
                          iters=60)
    assert np.all(np.isfinite(np.asarray(sol.y)))
    assert np.all(np.isfinite(np.asarray(sol.lam)))
    assert float(sol.primal_res[0]) > 1e-2   # infeasibility surfaced
    # violation_report names offending rows (conflict-refinement analog)
    vals, idx = qp_ops.violation_report(jnp.asarray(A_r[None]),
                                        jnp.asarray(b_r[None]), sol.y)
    assert float(vals[0, 0]) > 1e-2


def test_feasible_relaxation_kkt(lp, opt):
    """Dropping the LSC rows (keeping dynamics + bounds) yields a
    feasible QP; our IPM solution must satisfy the KKT conditions to
    f64 accuracy and match scipy's solution of the same QP."""
    F3 = np.kron(np.eye(3), np.asarray(opt.F))
    G3 = np.kron(np.eye(3), np.asarray(opt.G))
    s0 = np.zeros(9)
    s0[0::3] = P0
    x0 = G3 @ s0
    # LSC rows couple >= 2 dims or have non-integer coefficients; the
    # dynamic-limit rows are all single-dim with +-25 / +-500 / +-1000.
    # Identify LSC rows as those with any |coef| not in the dynamic set.
    dyn = np.isin(np.round(np.abs(lp.A_in), 6),
                  [0.0, 25.0, 500.0, 1000.0]).all(axis=1)
    A_keep = lp.A_in[dyn]
    b_keep = lp.b_in[dyn]
    Ab, bb = bounds_as_rows(lp)
    A_all = np.vstack([A_keep, Ab])
    b_all = np.concatenate([b_keep, bb])
    P_r = F3.T @ lp.P @ F3
    q_r = F3.T @ (lp.P @ x0 + lp.q)
    A_r = A_all @ F3
    b_r = b_all - A_all @ x0

    sol = qp_ops.solve_qp(jnp.asarray(P_r[None]), jnp.asarray(q_r[None]),
                          jnp.asarray(A_r[None]), jnp.asarray(b_r[None]),
                          iters=60)
    y = np.asarray(sol.y[0])
    lam = np.asarray(sol.lam[0])

    # KKT: primal feasibility
    viol = np.maximum(b_r - A_r @ y, 0.0)
    assert viol.max() < 1e-8
    # stationarity (duals are for the equilibrated rows; rescale back)
    rn = np.linalg.norm(A_r, axis=1)
    scale = 1.0 / np.maximum(rn, 1e-3)
    scale = np.minimum(scale, 1e3 / np.maximum(np.abs(b_r), 1.0))
    scale = np.where(rn < 1e-3, 0.0, scale)
    mu = lam * scale
    r_d = P_r @ y + q_r - A_r.T @ mu
    sigma = np.mean(np.abs(np.diag(P_r)))
    assert np.abs(r_d).max() / sigma < 1e-8
    # complementarity
    slack = A_r @ y - b_r
    assert np.abs(mu * slack).max() / sigma < 1e-6

    # global-optimality certificate via Lagrangian duality: for a convex
    # QP, primal - dual objective bounds the suboptimality of y from
    # above (zero iff optimal).  P_r is PD on the reduced space, so
    # g(mu) = -1/2 (q + A'mu... ) evaluated at y*(mu) = -P^-1 (q - A'mu)
    primal = 0.5 * y @ P_r @ y + q_r @ y
    y_mu = -np.linalg.solve(P_r, q_r - A_r.T @ mu)
    dual = (0.5 * y_mu @ P_r @ y_mu + q_r @ y_mu
            - mu @ (A_r @ y_mu - b_r))
    gap = primal - dual
    assert gap >= -1e-9 * sigma
    assert gap < 1e-6 * sigma, f"duality gap {gap} vs sigma {sigma}"
