"""Multi-chip execution: the swarm sharded over a device mesh.

The reference's distributed story is ROS TCP pub/sub between per-agent
planner nodes (SURVEY.md section 5.8); here the agent axis is sharded over
a ``jax.sharding.Mesh`` and the per-cycle neighbour-trajectory exchange is
one ``all_gather`` of the (N, M, n+1, 3) control-point tensor over ICI --
the direct analog of update()'s obstacle collection
(multi_sync_simulator.cpp:269-303).

Each shard then plans its local agent block against the gathered global
view with exactly the same `plan_block` code the single-chip path uses.
Scalar audit metrics are computed on gathered positions (replicated).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..sim import audit
from ..sim.simulator import SwarmState, CycleInfo, SyncSimulator

AGENT_AXIS = "agents"


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AGENT_AXIS,))


def state_specs() -> SwarmState:
    """PartitionSpecs for SwarmState: per-agent fields sharded, scalars
    replicated."""
    sharded = P(AGENT_AXIS)
    rep = P()
    return SwarmState(traj=sharded, pos=sharded, vel=sharded, acc=sharded,
                      current_goal=sharded, seq=rep, qp_cost=sharded,
                      primal_res=sharded, safety_agent_min=rep,
                      distance=rep, sfc=sharded, sfc_initialized=sharded,
                      start=sharded, desired_goal=sharded,
                      safety_obs_min=rep, stall_count=sharded,
                      rescue_goal=sharded, rescue_active=sharded,
                      rescue_phase=sharded)


def make_sharded_cycle(sim: SyncSimulator, mesh: Mesh):
    """Build the jitted multi-chip cycle: state sharded over the agent
    axis; one all_gather per cycle for the trajectory exchange."""
    p = sim.param
    N = sim.N
    n_dev = mesh.devices.size
    if N % n_dev != 0:
        raise ValueError(f"agent count {N} must be divisible by the mesh "
                         f"size {n_dev} (pad the mission)")
    L = N // n_dev

    specs = state_specs()

    def body(state: SwarmState):
        # local block: (L, ...) per-agent leaves
        shard = jax.lax.axis_index(AGENT_AXIS)
        my_ids = shard * L + jnp.arange(L)

        pos_l, vel_l, acc_l = sim.propagate(state)
        from ..sim.simulator import _update_stall_count, _update_rescue, \
            _no_rescue
        stall_count, progress = _update_stall_count(
            state.stall_count, state.pos, pos_l, vel_l,
            state.desired_goal, state.seq, p)
        if p.deadlock_rescue:
            rescue_goal, rescue_active, rescue_phase, stall_count = \
                _update_rescue(state, pos_l, state.desired_goal,
                               stall_count, progress, p)
        else:
            rescue_goal, rescue_active, rescue_phase = _no_rescue(state)
        init_l, pred_l = sim.predict_and_init(state.traj, pos_l, vel_l,
                                              state.seq)

        # --- the communication step: neighbour trajectory exchange ---
        pred_g = jax.lax.all_gather(pred_l, AGENT_AXIS, tiled=True)
        pos_g = jax.lax.all_gather(pos_l, AGENT_AXIS, tiled=True)
        prev_g = jax.lax.all_gather(state.traj, AGENT_AXIS, tiled=True)
        goal_g = jax.lax.all_gather(state.desired_goal, AGENT_AXIS,
                                    tiled=True)

        self_mask = my_ids[:, None] == jnp.arange(N)[None, :]

        sfc_initialize = ~state.sfc_initialized
        sfc_seed = jnp.where(sfc_initialize[:, None], pos_l,
                             state.traj[:, -1, -1, :])
        res, current_goal, sfc = sim.plan_block(
            pos_l, vel_l, acc_l, init_l, state.seq,
            pred_global=pred_g, obs_pos_global=pos_g,
            obs_goal_global=goal_g,
            obs_prev_global=prev_g,
            self_mask=self_mask,
            radius=sim.radius[my_ids], downwash=sim.downwash[my_ids],
            nominal_velocity=sim.nominal_velocity[my_ids],
            max_vel=sim.max_vel[my_ids], max_acc=sim.max_acc[my_ids],
            desired_goal=state.desired_goal,
            sfc_prev=state.sfc, sfc_initialize=sfc_initialize,
            sfc_seed=sfc_seed, rescue_goal=rescue_goal,
            rescue_active=rescue_active)

        # --- audit on gathered sampled positions (replicated scalar) ---
        ts = audit._sample_times(p.multisim_record_time_step,
                                 p.multisim_time_step, inclusive=True)
        pos_samples_l = audit.positions_at(res.traj, ts, p.dt)  # (T, L, 3)
        pos_samples = jax.lax.all_gather(pos_samples_l, AGENT_AXIS,
                                         tiled=True, axis=1)    # (T, N, 3)
        safety_step = jnp.min(audit.pairwise_safety_ratio(
            pos_samples[:-1], sim.radius, sim.downwash))
        seg = jnp.linalg.norm(jnp.diff(pos_samples, axis=0), axis=-1)
        step_dist = jnp.sum(seg)

        new_state = SwarmState(
            traj=res.traj, pos=pos_l, vel=vel_l, acc=acc_l,
            current_goal=current_goal, seq=state.seq + 1,
            qp_cost=res.cost, primal_res=res.primal_res,
            safety_agent_min=jnp.minimum(state.safety_agent_min,
                                         safety_step),
            distance=state.distance + step_dist,
            sfc=sfc if sfc is not None else state.sfc,
            sfc_initialized=jnp.ones_like(state.sfc_initialized),
            start=state.start, desired_goal=state.desired_goal,
            safety_obs_min=state.safety_obs_min,
            stall_count=stall_count, rescue_goal=rescue_goal,
            rescue_active=rescue_active, rescue_phase=rescue_phase)
        info = CycleInfo(safety_step_min=safety_step, qp_cost=res.cost,
                         primal_res=res.primal_res)
        return new_state, info

    sharded = shard_map(body, mesh=mesh,
                        in_specs=(specs,),
                        out_specs=(specs,
                                   CycleInfo(safety_step_min=P(),
                                             qp_cost=P(AGENT_AXIS),
                                             primal_res=P(AGENT_AXIS))),
                        check_vma=False)
    return jax.jit(sharded)


def shard_state(state: SwarmState, mesh: Mesh) -> SwarmState:
    """Place a host-built initial state onto the mesh with the cycle's
    shardings."""
    specs = state_specs()
    return jax.tree.map(
        lambda x, s: jax.device_put(
            x, jax.sharding.NamedSharding(mesh, s)), state, specs)
