"""Disturbance-reset slack recovery, end to end.

Reference path: external pose deviates > multisim_reset_threshold ->
agent state resets to the observation with zeroed derivatives and a
frozen trajectory (multi_sync_simulator.cpp:210-246); the next cycle
slacks the deviated obstacle's LSC rows for everyone and ALL rows for the
deviated agent itself, switches non-agent slack obstacles to the RSFC
margin, and re-seeds the SFC (traj_planner.cpp:866-878, :1047-1061,
:1388-1400; traj_optimizer.cpp:317-326).
"""
import jax.numpy as jnp
import numpy as np

from lsc_planner_tpu.config import Param, GoalMode
from lsc_planner_tpu.missions import make_square_mission
from lsc_planner_tpu.sim.simulator import SyncSimulator


def _sim(**kw):
    param = Param(goal_mode=GoalMode.PRIOR_BASED, qp_iterations=20,
                  multisim_experiment=True, **kw)
    mission = make_square_mission(4)
    return SyncSimulator(mission, param, dtype=jnp.float64)


def test_injection_marks_and_freezes():
    sim = _sim()
    state = sim.initial_state()
    for _ in range(5):
        state, _ = sim._cycle_jit(state)
    # inject: agent 0 observed 0.5 m off its planned position
    real = np.array(sim.propagate(state)[0])
    real[0] += np.array([0.5, 0.0, 0.0])
    state2 = sim.inject_positions(state, real)
    flags = np.asarray(state2.slack_flags)
    assert flags[0] and not flags[1:].any()
    # trajectory frozen at the observation, SFC re-seeded
    tr = np.asarray(state2.traj)
    assert np.allclose(tr[0], real[0][None, None, :])
    assert not bool(np.asarray(state2.sfc_initialized)[0])
    assert bool(np.asarray(state2.sfc_initialized)[1])


def test_recovery_after_disturbance():
    """A mid-run disturbance beyond the reset threshold must keep the QP
    feasible (slack rows) and the swarm must still complete the mission
    collision-free afterwards."""
    sim = _sim()
    state = sim.initial_state()
    for _ in range(5):
        state, _ = sim._cycle_jit(state)
    real = np.array(sim.propagate(state)[0])
    # push agent 0 toward agent 1's lane: a hard but survivable case
    real[0] += np.array([0.3, 0.3, 0.0])
    state = sim.inject_positions(state, real)
    # the very next cycle runs the slack-relaxed QP: must stay finite and
    # near-feasible despite the frozen/deviated trajectory
    state, info = sim._cycle_jit(state)
    assert np.isfinite(np.asarray(state.traj)).all()
    assert float(jnp.max(info.primal_res)) < 0.1
    # flags are one-shot (rebuilt per cycle in the reference)
    assert not np.asarray(state.slack_flags).any()
    for it in range(80):
        state, info = sim._cycle_jit(state)
        if sim.is_finished(state):
            break
    assert sim.is_finished(state), "swarm did not recover to its goals"
    # no inter-agent collision AFTER the disturbance settled (the
    # injection itself may momentarily violate the planned-safety audit)
    assert float(state.safety_agent_min) > 0.8


def test_no_slack_graph_outside_experiment_mode():
    """Pure simulation keeps the lean no-slack QP graph; the state flags
    exist but are inert."""
    param = Param(goal_mode=GoalMode.PRIOR_BASED, qp_iterations=14)
    mission = make_square_mission(4)
    sim = SyncSimulator(mission, param, dtype=jnp.float64)
    state = sim.initial_state()
    for _ in range(3):
        state, _ = sim._cycle_jit(state)
    assert not np.asarray(state.slack_flags).any()


def test_qp_failure_surfacing():
    """QPFAILED analog: with an absurdly tight failure threshold every
    solve reports failure -- the run must substitute the feasible
    previous solution, count failures in the summary, emit a violation
    report, and honor the abort flag."""
    param = Param(goal_mode=GoalMode.PRIOR_BASED, qp_iterations=14,
                  qp_failure_threshold=-1.0,
                  multisim_abort_on_qp_failure=True)
    mission = make_square_mission(4)
    sim = SyncSimulator(mission, param, dtype=jnp.float64)
    summary = sim.run(max_iterations=10)
    assert summary["qp_failures"] > 0
    assert summary["iterations"] <= 2          # aborted on first failure
    # report helper returns per-agent top rows
    state = sim.initial_state()
    state1, info = sim._cycle_jit(state)
    rep = sim.qp_violation_report(state, state1)
    for rows in rep.values():
        assert all({"obstacle", "segment", "ctrl_pt",
                    "violation"} <= set(r) for r in rows)
