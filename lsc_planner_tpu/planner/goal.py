"""Goal planning stage, batched over the swarm.

Reference: TrajPlanner::goalPlanning* (src/traj_planner.cpp:477-608).
The deadlock-avoiding `prior_based` default combines priority rules,
grid A* around higher-priority agents, and line-of-sight sub-goal
selection (grid_based_planner.cpp:350-433).  Priority logic and the
LOS/goal-radius clamp are pure vectorized tensor logic; the grid search
(needed only for octomap worlds / static obstacles) lives in
``ops/grid_search.py`` as a batched wavefront sweep.
"""
from __future__ import annotations

import dataclasses
import jax.numpy as jnp
import numpy as np

from ..config import Param, GoalMode, SP_INFINITY
from ..missions import Mission


@dataclasses.dataclass
class GoalPlanner:
    mission: Mission
    param: Param
    esdf: object = None           # world.esdf.ESDF for octomap worlds
    dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        self.grid_planner = None
        if self.esdf is not None:
            from ..ops.grid_search import GridPlanner
            self.grid_planner = GridPlanner(self.mission, self.param,
                                            self.esdf, dtype=self.dtype)

    def plan(self, pos, vel, init_traj, desired_goal, seq, radius,
             downwash, prev_traj=None, obs_pos=None, obs_goal=None,
             obs_prev_traj=None, self_mask=None, obs_radius=None,
             obs_downwash=None, orca_vel=None):
        """Plan current goals for a block of agents.

        pos/vel/init_traj/desired_goal: local agent block (L, ...).
        obs_pos/obs_goal/obs_prev_traj/obs_radius/obs_downwash: the global
        obstacle (= all agents) view (N, ...); default to the local block
        (single-chip case).  self_mask: (L, N) bool marking each agent's
        own column.

        Returns (current_goal (L, 3), path_floor (L, 3)).  path_floor is
        the grid-path escape point for the deadlock rescue (see
        GridPlanner.plan_goals); it degenerates to `pos` (an invalid
        escape, skipped by the rescue) for modes/worlds without a grid
        path.
        """
        mode = self.param.goal_mode
        if obs_pos is None:
            obs_pos, obs_goal, obs_prev_traj = pos, desired_goal, \
                (prev_traj if prev_traj is not None else init_traj)
            obs_radius, obs_downwash = radius, downwash
            self_mask = jnp.eye(pos.shape[0], dtype=bool)
        if mode == GoalMode.STATIC:
            return desired_goal, pos
        if mode == GoalMode.RIGHT_HAND:
            return self._right_hand(pos, vel, desired_goal, seq), pos
        if mode == GoalMode.PRIOR_BASED:
            return self._prior_based(pos, vel, init_traj, desired_goal,
                                     seq, radius, downwash, obs_pos,
                                     obs_goal, obs_prev_traj, self_mask,
                                     obs_radius, obs_downwash)
        if mode == GoalMode.ORCA:
            return self._orca_goal(pos, desired_goal, orca_vel), pos
        raise NotImplementedError(mode)

    def _orca_goal(self, pos, desired_goal, orca_vel):
        """goalPlanningWithORCA (traj_planner.cpp:515-526): advance along
        the ORCA velocity; snap to the desired goal when the goal lies
        within 0.05 m of the motion segment."""
        from ..ops.geometry import closest_point_on_segment
        p = self.param
        cand = pos + orca_vel * (p.M * p.dt)
        _, dist = closest_point_on_segment(desired_goal, pos, cand)
        return jnp.where((dist < 0.05)[:, None], desired_goal, cand)

    # ------------------------------------------------------------------
    def _right_hand(self, pos, vel, desired_goal, seq):
        """Deadlock -> displace the goal to the right of the goal direction
        (goalPlanningWithRightHandRule, traj_planner.cpp:528-538; deadlock
        test isDeadlock :1733-1748)."""
        p = self.param
        dist_to_goal = jnp.linalg.norm(pos - desired_goal, axis=-1)
        deadlock = ((seq > p.deadlock_seq_threshold) &
                    (jnp.linalg.norm(vel, axis=-1)
                     < p.deadlock_velocity_threshold) &
                    (dist_to_goal > p.goal_threshold))
        z_axis = jnp.asarray([0.0, 0.0, 1.0], pos.dtype)
        right = jnp.cross(desired_goal - pos,
                          jnp.broadcast_to(z_axis, pos.shape))
        return jnp.where(deadlock[:, None], pos + right, desired_goal)

    # ------------------------------------------------------------------
    def _prior_based(self, pos, vel, init_traj, desired_goal, seq, radius,
                     downwash, obs_pos, obs_goal, obs_prev_traj, self_mask,
                     obs_radius, obs_downwash):
        """goalPlanningWithPriority (traj_planner.cpp:540-608), batched.

        Local block (L, ...) against the global obstacle view (N, ...):
        the other agents with positions obs_pos, goals obs_goal, and
        previous solutions obs_prev_traj (N, M, n+1, 3).
        """
        p = self.param

        dist_to_goal = jnp.linalg.norm(pos - desired_goal, axis=-1)  # (L,)
        # pairwise [i, j]: local agent i evaluating obstacle j
        obs_dist_to_goal = jnp.linalg.norm(obs_pos - obs_goal,
                                           axis=-1)[None, :]     # (1, N)
        dist_to_obs = jnp.linalg.norm(obs_pos[None, :] - pos[:, None],
                                      axis=-1)                   # (L, N)

        near_own_goal = dist_to_goal < p.goal_threshold          # (L,)
        obs_near_goal = obs_dist_to_goal < p.goal_threshold      # (1, N)

        # "same direction" skip: (obs_end - obs_first_end) . (obs_first_end
        #  - my_pos) > 0 with endpoints of the obstacle's previous solution
        obs_end = obs_prev_traj[:, -1, -1, :]                    # (N, 3)
        obs_first_end = obs_prev_traj[:, 0, -1, :]               # (N, 3)
        dirn = jnp.einsum(
            "jd,ijd->ij", obs_end - obs_first_end,
            obs_first_end[None, :, :] - pos[:, None, :])
        same_dir = (~near_own_goal[:, None]) & (dirn > 0)

        higher = ((~self_mask) & (~obs_near_goal) & (~same_dir) &
                  (near_own_goal[:, None] |
                   (obs_dist_to_goal < dist_to_goal[:, None])))

        # closest higher-priority agent
        d_hp = jnp.where(higher, dist_to_obs, SP_INFINITY)
        min_dist = jnp.min(d_hp, axis=1)                         # (L,)
        closest = jnp.argmin(d_hp, axis=1)                       # (L,)

        # back-away rule (traj_planner.cpp:579-587)
        dist_keep = p.priority_dist_threshold + 0.1
        obs_closest_pos = obs_pos[closest]                       # (L, 3)
        away = pos - _normalize(obs_closest_pos - pos) * dist_keep
        too_close = min_dist < p.priority_dist_threshold

        # LOS-free goal from the initial trajectory endpoint
        # (traj_planner.cpp:601-607 + findLOSFreeGoal clamp,
        # grid_based_planner.cpp:396-404)
        init_end = init_traj[:, -1, -1, :]                       # (N, 3)
        if self.grid_planner is not None:
            los_goal, path_floor = self.grid_planner.plan_goals(
                pos, init_end, desired_goal, radius, downwash,
                obs_pos, obs_radius, obs_downwash, higher)
        else:
            # empty world: every path point has line of sight, so the
            # LOS-free goal degenerates to the desired goal (and there is
            # no grid path to floor the rescue on)
            los_goal = desired_goal
            path_floor = pos
        delta = los_goal - init_end
        dist = jnp.linalg.norm(delta, axis=-1, keepdims=True)
        clamped = jnp.where(dist > p.goal_radius,
                            init_end + _normalize(delta) * p.goal_radius,
                            los_goal)
        # NOTE: the deadlock rescue (latched escape waypoints) lives in the
        # simulator cycle (sim/simulator.py _update_rescue), which owns the
        # cross-cycle state it needs; it overrides this sub-goal when
        # active.
        return jnp.where(too_close[:, None], away, clamped), path_floor


def _normalize(v, eps=1e-12):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)
