"""Synchronous multi-agent replanning simulator, batched on device.

Re-design of MultiSyncSimulator (src/multi_sync_simulator.cpp): the
reference's per-cycle sequence -- step clock, propagate ideal states,
exchange obstacle info, plan each agent sequentially, audit collisions,
log -- becomes one jitted tensor program over the whole swarm per cycle,
with a thin host loop for termination/metrics/CSV.

The reference's "communication step" (update() collecting every agent's
previous trajectory into per-agent ObstacleArrays,
multi_sync_simulator.cpp:269-303) is here a broadcast of the shared
(N, M, n+1, 3) control-point tensor; across TPU chips it becomes an
all_gather over the agent-sharded mesh (see parallel/).
"""
from __future__ import annotations

import dataclasses
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (Param, PlannerMode, GoalMode, PlannerState, SP_EPSILON,
                      SP_EPSILON_FLOAT)
from ..missions import Mission
from ..ops import bernstein as bz
from ..ops import geometry as geo
from . import audit
from ..planner import constraints as cons
from ..planner import prediction as pred
from ..planner import goal as goal_mod
from ..planner.optimizer import TrajOptimizer, PlaneConstraints


class SwarmState(NamedTuple):
    """Device-side swarm state carried across planning cycles."""
    traj: jnp.ndarray          # (N, M, n+1, 3) current solutions
    pos: jnp.ndarray           # (N, 3)
    vel: jnp.ndarray           # (N, 3)
    acc: jnp.ndarray           # (N, 3)
    current_goal: jnp.ndarray  # (N, 3)
    seq: jnp.ndarray           # () int32 planner sequence number
    qp_cost: jnp.ndarray       # (N,)
    primal_res: jnp.ndarray    # (N,) constraint violation of last QP
    safety_agent_min: jnp.ndarray  # () running min inter-agent safety ratio
    distance: jnp.ndarray      # () running total flight distance


class CycleInfo(NamedTuple):
    safety_step_min: jnp.ndarray
    qp_cost: jnp.ndarray
    primal_res: jnp.ndarray


@dataclasses.dataclass
class SyncSimulator:
    """Batched synchronous replanning loop for one mission.

    Orchestration analog of MultiSyncSimulator::run (:83-147) with the
    planner pipeline of TrajPlanner::planImpl (traj_planner.cpp:344-373)
    inlined as one fused device program.
    """
    mission: Mission
    param: Param
    esdf: object = None           # world.esdf.ESDF | None (octomap worlds)
    dtype: object = jnp.float32

    def __post_init__(self):
        self.param = self.param.validated()
        p = self.param
        self.N = self.mission.qn
        self.M, self.n = p.M, p.n
        self.optimizer = TrajOptimizer(p)
        arrs = self.mission.agent_arrays()
        dt = self.dtype
        self.start = jnp.asarray(arrs["start"], dt)
        self.desired_goal = jnp.asarray(arrs["goal"], dt)
        self.radius = jnp.asarray(arrs["radius"], dt)
        self.downwash = jnp.asarray(arrs["downwash"], dt)
        self.nominal_velocity = jnp.asarray(arrs["nominal_velocity"], dt)
        self.max_vel = jnp.asarray(arrs["max_vel"], dt)
        self.max_acc = jnp.asarray(arrs["max_acc"], dt)
        self.world_min = jnp.asarray(self.mission.world_min, dt)
        self.world_max = jnp.asarray(self.mission.world_max, dt)
        self._cycle_jit = jax.jit(self._cycle)
        self.goal_planner = goal_mod.GoalPlanner(self.mission, p, self.esdf,
                                                 dtype=self.dtype)

    # ------------------------------------------------------------------
    def initial_state(self) -> SwarmState:
        N, M, n = self.N, self.M, self.n
        dt = self.dtype
        traj = jnp.broadcast_to(self.start[:, None, None, :],
                                (N, M, n + 1, 3)).astype(dt)
        zeros = jnp.zeros((N, 3), dt)
        return SwarmState(
            traj=traj, pos=self.start, vel=zeros, acc=zeros,
            current_goal=self.desired_goal,
            seq=jnp.zeros((), jnp.int32),
            qp_cost=jnp.zeros((N,), dt),
            primal_res=jnp.zeros((N,), dt),
            safety_agent_min=jnp.asarray(np.inf, dt),
            distance=jnp.zeros((), dt),
        )

    # ------------------------------------------------------------------
    def _cycle(self, state: SwarmState) -> tuple:
        """One synchronous planning cycle for all agents (fused)."""
        p = self.param
        N, M, n = self.N, self.M, self.n

        # --- 1. state propagation (update(), multi_sync_simulator.cpp
        #     :190-246): ideal flat-output rollout of the previous solution
        is_first = state.seq == 0
        rolled = jax.vmap(lambda tr: bz.traj_state(tr, p.multisim_time_step,
                                                   p.dt))(state.traj)
        pos = jnp.where(is_first, state.pos, rolled["pos"])
        vel = jnp.where(is_first, state.vel, rolled["vel"])
        acc = jnp.where(is_first, state.acc, rolled["acc"])

        # --- 2. obstacle prediction + initial trajectory (previous-solution
        #     shift; falls back to constant velocity for seq < 2,
        #     traj_planner.cpp:829-864, :997-1016)
        shifted = pred.shift_previous_solution(state.traj)
        const_vel = pred.constant_velocity_traj(pos, vel, M, n, p.dt)
        use_shift = (state.seq >= 1)[..., None, None, None]
        init = jnp.where(use_shift, shifted, const_vel)
        # per-agent view of all obstacles' predictions (the communication
        # step: one broadcast of the shared tensor)
        obs_pred = jnp.broadcast_to(init[None], (N, N, M, n + 1, 3))

        # --- 3. goal planning ---
        current_goal = self.goal_planner.plan(
            pos=pos, vel=vel, init_traj=init,
            desired_goal=self.desired_goal, seq=state.seq,
            radius=self.radius, downwash=self.downwash,
            prev_traj=state.traj)

        # --- 4. collision constraints ---
        obs_is_agent = jnp.ones((N, N), bool)
        obs_mask = ~jnp.eye(N, dtype=bool)
        obs_radius = jnp.broadcast_to(self.radius[None, :], (N, N))
        obs_downwash = jnp.broadcast_to(self.downwash[None, :], (N, N))
        if p.planner_mode == PlannerMode.LSC:
            planes = cons.lsc_planes(init, obs_pred, self.radius,
                                     self.downwash, obs_radius,
                                     obs_downwash, obs_is_agent, obs_mask)
        elif p.planner_mode == PlannerMode.BVC:
            planes = cons.bvc_planes(init, obs_pred, self.radius,
                                     self.downwash, obs_radius,
                                     obs_downwash, obs_is_agent, obs_mask)
        else:
            raise NotImplementedError(p.planner_mode)
        planes = cons.concat_planes(planes, n_ctrl=n + 1)

        # --- 5. trajectory optimization (batched QP) ---
        res = self.optimizer.solve(
            pos, vel, acc, current_goal,
            nominal_velocity=self.nominal_velocity,
            max_vel=self.max_vel, max_acc=self.max_acc,
            planes=planes, world_min=self.world_min,
            world_max=self.world_max, dtype=self.dtype)

        # --- 6. safety audit + metrics over the upcoming time step
        #     (savePlanningResult, multi_sync_simulator.cpp:446-503) ---
        safety_step = audit.step_safety_ratio(
            res.traj, self.radius, self.downwash, p.dt,
            p.multisim_record_time_step, p.multisim_time_step)
        step_dist = audit.step_distance(
            res.traj, p.dt, p.multisim_record_time_step,
            p.multisim_time_step)

        new_state = SwarmState(
            traj=res.traj, pos=pos, vel=vel, acc=acc,
            current_goal=current_goal,
            seq=state.seq + 1,
            qp_cost=res.cost, primal_res=res.primal_res,
            safety_agent_min=jnp.minimum(state.safety_agent_min,
                                         safety_step),
            distance=state.distance + step_dist,
        )
        info = CycleInfo(safety_step_min=safety_step, qp_cost=res.cost,
                         primal_res=res.primal_res)
        return new_state, info

    # ------------------------------------------------------------------
    def is_finished(self, state: SwarmState) -> bool:
        """All agents within goal_threshold of their desired goals
        (isFinished, multi_sync_simulator.cpp:358-380)."""
        d = jnp.linalg.norm(state.pos - self.desired_goal, axis=-1)
        return bool(jnp.max(d) < self.param.goal_threshold)

    def run(self, max_iterations: Optional[int] = None,
            log: Optional[object] = None) -> dict:
        """Host loop: cycle until all agents reach goals or iteration cap.

        Returns a summary dict in the shape of the reference's summary CSV
        row (saveSummarizedResultAsCSV, multi_sync_simulator.cpp:589-633).
        """
        p = self.param
        max_iter = max_iterations or p.multisim_max_planner_iteration
        state = self.initial_state()
        t_wall0 = time.perf_counter()
        plan_times = []
        is_collided = False
        flight_time = float("nan")
        iters_done = 0
        for it in range(max_iter):
            t0 = time.perf_counter()
            state, info = self._cycle_jit(state)
            state.traj.block_until_ready()
            plan_times.append(time.perf_counter() - t0)
            iters_done = it + 1
            if float(info.safety_step_min) < 1.0:
                is_collided = True
            if log is not None:
                log.record_cycle(self, state, plan_times[-1])
            if self.is_finished(state):
                flight_time = iters_done * p.multisim_time_step
                break
        wall = time.perf_counter() - t_wall0
        pt = np.asarray(plan_times[1:]) if len(plan_times) > 1 else \
            np.asarray(plan_times)
        return {
            "total_flight_time": flight_time,
            "total_flight_distance": float(state.distance),
            "is_collided": bool(is_collided),
            "safety_ratio_agent": float(state.safety_agent_min),
            "average_planning_time": float(pt.mean()) if pt.size else 0.0,
            "min_planning_time": float(pt.min()) if pt.size else 0.0,
            "max_planning_time": float(pt.max()) if pt.size else 0.0,
            "iterations": iters_done,
            "wall_time": wall,
            "planner_mode": p.planner_mode_str(),
            "final_state": state,
        }
