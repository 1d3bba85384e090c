"""Obstacle prediction + initial trajectory stages, batched over the swarm.

Reference: TrajPlanner::obstaclePrediction* (src/traj_planner.cpp:610-919)
and initialTrajPlanning* (:921-1061).  In LSC mode both stages are the same
one-segment shift of the previous cycle's solution, so the whole swarm's
prediction is a single tensor shift -- computed once globally instead of the
reference's O(N^2) per-observer copies (decoupling proof: SURVEY.md 3.2).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import bernstein as bz


def shift_previous_solution(traj):
    """Shift a piecewise trajectory one segment ahead, holding the endpoint.

    traj: (..., M, n+1, 3).  Segment m <- m+1; last segment collapses to the
    terminal point (obstaclePredictionWithPrevSol traj_planner.cpp:848-858,
    initialTrajPlanningPrevSol :997-1016).
    """
    M = traj.shape[-3]
    n = traj.shape[-2] - 1
    shifted = jnp.roll(traj, -1, axis=-3)
    hold = jnp.broadcast_to(traj[..., M - 1:M, n:n + 1, :],
                            traj[..., M - 1:M, :, :].shape)
    return jnp.concatenate([shifted[..., :M - 1, :, :], hold], axis=-3)


def constant_velocity_traj(pos, vel, M: int, n: int, dt: float):
    """Straight-line constant-velocity trajectory control points.

    pos, vel: (..., 3) -> (..., M, n+1, 3).  Control point (m, i) sits at
    pos + vel * (m + i/n) * dt (obstaclePredictionWithCurrVel
    traj_planner.cpp:697-712, initialTrajPlanningCurrVel :1030-1037).
    """
    m = jnp.arange(M, dtype=pos.dtype)[:, None]
    i = jnp.arange(n + 1, dtype=pos.dtype)[None, :]
    tau = (m + i / n) * dt                              # (M, n+1)
    return pos[..., None, None, :] + vel[..., None, None, :] * \
        tau[..., :, :, None]


def constant_position_traj(pos, M: int, n: int):
    """All control points at the current position
    (obstaclePredictionWithCurrPos traj_planner.cpp:796-807)."""
    return jnp.broadcast_to(pos[..., None, None, :],
                            pos.shape[:-1] + (M, n + 1, 3))


def obstacle_size_prediction(radius, max_acc, M: int, n: int, dt: float,
                             uncertainty_horizon: float,
                             size_prediction: bool = True):
    """Uncertainty-inflated obstacle radii per (segment, control point).

    radius, max_acc: (...,) -> sizes (..., M, n+1).  Const-acc inflation
    expressed in Bernstein form via B^{-1} for m < M_uncertainty, saturating
    beyond (obstacleSizePredictionWithConstAcc, traj_planner.cpp:880-919).
    """
    radius = jnp.asarray(radius)
    max_acc = jnp.asarray(max_acc)
    if not size_prediction:
        return jnp.broadcast_to(radius[..., None, None],
                                radius.shape + (M, n + 1))
    M_unc = int((uncertainty_horizon + 1e-9) / dt)
    B_inv = np.asarray(bz.bernstein_matrix_inv(n))
    rows = []
    for m in range(M):
        if m < M_unc:
            coef = np.zeros(n + 1)
            coef[0] = 0.5 * (m * dt) ** 2
            coef[1] = m * dt ** 2
            coef[2] = 0.5 * dt ** 2
            rows.append(coef @ B_inv)          # inflation per unit max_acc
        else:
            rows.append(np.full(n + 1, 0.5 * (M_unc * dt) ** 2))
    infl = jnp.asarray(np.stack(rows), dtype=radius.dtype)   # (M, n+1)
    return radius[..., None, None] + max_acc[..., None, None] * infl


def prediction_check(pred, obs_pos, reset_threshold: float):
    """Disturbance gate: if a predicted start deviates from the observed
    obstacle position by more than the reset threshold, freeze that
    obstacle's prediction at its observed position and flag it for slack
    (obstaclePredictionCheck, traj_planner.cpp:866-878).

    pred: (..., O, M, n+1, 3), obs_pos: (..., O, 3).
    Returns (pred', slack_flags (..., O) bool).
    """
    start = pred[..., 0, 0, :]
    deviated = jnp.linalg.norm(start - obs_pos, axis=-1) > reset_threshold
    frozen = jnp.broadcast_to(obs_pos[..., None, None, :], pred.shape)
    pred = jnp.where(deviated[..., None, None, None], frozen, pred)
    return pred, deviated


def initial_traj_check(init, pos, reset_threshold: float):
    """Same gate for the agent's own initial trajectory
    (initialTrajPlanningCheck, traj_planner.cpp:1047-1061): on large
    deviation the initial trajectory collapses to the current position and
    the SFC must be re-seeded.  init: (N, M, n+1, 3), pos: (N, 3).
    Returns (init', reset_flags (N,))."""
    deviated = jnp.linalg.norm(init[:, 0, 0, :] - pos, axis=-1) \
        > reset_threshold
    frozen = jnp.broadcast_to(pos[:, None, None, :], init.shape)
    init = jnp.where(deviated[:, None, None, None], frozen, init)
    return init, deviated


def linear_prediction_slowdown(init, obs_pred, agent_radius, obs_radius,
                               obs_mask, horizon, esdf=None,
                               search_step: float = 0.1, eps: float = 1e-6):
    """Slow-down factor for linear prediction modes (generateLSC preamble,
    traj_planner.cpp:1310-1330): if any predicted straight-line motion
    collides within the horizon, the initial and predicted trajectories
    are contracted around their start points by
    alpha = (t_min_collision - eps) / horizon.

    init: (L, M, n+1, 3); obs_pred: (L, O, M, n+1, 3);
    agent_radius: (L,); obs_radius, obs_mask: (L, O).
    Checked, per agent: own path vs the static distmap (sampled at
    search_step like computeCollisionTimeToDistmap,
    traj_planner.cpp:1760-1793), own path vs every obstacle path, and
    obstacle-vs-obstacle pairs within the agent's own obstacle view
    (computeMinCollisionTime :1795-1870).  Returns alpha (L,) in [0, 1].
    """
    from ..ops import geometry as geo
    a_start = init[:, 0, 0, :]
    a_end = init[:, -1, -1, :]
    o_start = obs_pred[:, :, 0, 0, :]                  # (L, O, 3)
    o_end = obs_pred[:, :, -1, -1, :]

    # agent vs obstacles
    t_ao = geo.collision_time_linear(
        o_start, o_end, a_start[:, None], a_end[:, None],
        agent_radius[:, None] + obs_radius, horizon)
    t_ao = jnp.where(obs_mask, t_ao, jnp.inf)
    t_min = jnp.min(t_ao, axis=1)                      # (L,)

    # obstacle pairs within this agent's view (j < k)
    O = obs_pred.shape[1]
    t_oo = geo.collision_time_linear(
        o_start[:, :, None], o_end[:, :, None],
        o_start[:, None, :], o_end[:, None, :],
        obs_radius[:, :, None] + obs_radius[:, None, :], horizon)
    pair_mask = (obs_mask[:, :, None] & obs_mask[:, None, :] &
                 (jnp.arange(O)[:, None] < jnp.arange(O)[None, :]))
    t_oo = jnp.where(pair_mask, t_oo, jnp.inf)
    t_min = jnp.minimum(t_min, jnp.min(t_oo, axis=(1, 2)))

    # own path vs the static distance map, sampled every search_step
    if esdf is not None:
        n_samp = max(int(np.ceil(horizon / search_step)) + 1, 2)
        taus = jnp.linspace(0.0, 1.0, n_samp).astype(init.dtype)
        pts = (a_start[:, None, :] +
               (a_end - a_start)[:, None, :] * taus[:, None])  # (L, S, 3)
        hit = esdf.at_points(pts) < agent_radius[:, None]
        t_samp = jnp.where(hit, taus * horizon, jnp.inf)
        t_min = jnp.minimum(t_min, jnp.min(t_samp, axis=1))

    alpha = jnp.clip((t_min - eps) / horizon, 0.0, 1.0)
    return jnp.where(jnp.isfinite(t_min), alpha, 1.0)


def contract_trajectories(traj, alpha):
    """Scale control points toward the trajectory start by alpha
    (traj_planner.cpp:1323-1328): c <- c0 + alpha (c - c0).
    traj: (..., M, n+1, 3); alpha broadcastable to the batch dims."""
    c0 = traj[..., 0:1, 0:1, :]
    return c0 + alpha[..., None, None, None] * (traj - c0)
