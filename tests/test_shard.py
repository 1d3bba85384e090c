"""Multi-chip sharded cycle on the virtual 8-device CPU mesh: must compile,
run, and agree with the single-device cycle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsc_planner_tpu.config import Param, GoalMode
from lsc_planner_tpu.missions import make_circle_mission
from lsc_planner_tpu.parallel import shard as pshard
from lsc_planner_tpu.sim.simulator import SyncSimulator


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pshard.make_mesh(8)


# NOTE: the exact-parity tests below pin qp_tol_gap/rp = 0 (no early
# exit): the exit test is batch-global, so a sharded run (per-shard
# batches) and a single-chip run (global batch) could stop at different
# iteration counts and diverge at the exit-tolerance level.


def test_sharded_cycle_matches_single(mesh):
    mission = make_circle_mission(16, radius=4.0)
    p = Param(goal_mode=GoalMode.PRIOR_BASED, qp_iterations=14,
              qp_tol_gap=0.0, qp_tol_rp=0.0)
    sim = SyncSimulator(mission, p, dtype=jnp.float64)
    cycle_sharded = pshard.make_sharded_cycle(sim, mesh)

    state_s = pshard.shard_state(sim.initial_state(), mesh)
    state_1 = sim.initial_state()
    for _ in range(3):
        state_s, info_s = cycle_sharded(state_s)
        state_1, info_1 = sim._cycle_jit(state_1)
    np.testing.assert_allclose(np.asarray(state_s.traj),
                               np.asarray(state_1.traj), atol=1e-8)
    np.testing.assert_allclose(float(state_s.safety_agent_min),
                               float(state_1.safety_agent_min), atol=1e-8)
    np.testing.assert_allclose(float(state_s.distance),
                               float(state_1.distance), atol=1e-7)


def test_ring_halo_full_window_matches_all_gather(mesh):
    """With 2H+1 == mesh size the ring-halo view covers the whole swarm,
    so the halo cycle must agree with the all_gather cycle (the view is a
    per-shard rotation of the same obstacle set; constraint ROW order
    differs, hence tolerance instead of bitwise)."""
    mesh7 = pshard.make_mesh(7)
    mission = make_circle_mission(14, radius=4.0)
    p = Param(goal_mode=GoalMode.PRIOR_BASED, qp_iterations=14,
              qp_tol_gap=0.0, qp_tol_rp=0.0)
    sim = SyncSimulator(mission, p, dtype=jnp.float64)
    cycle_full = pshard.make_sharded_cycle(sim, mesh7)
    cycle_halo = pshard.make_sharded_cycle(sim, mesh7, halo_shards=3)

    state_f = pshard.shard_state(sim.initial_state(), mesh7)
    state_h = pshard.shard_state(sim.initial_state(), mesh7)
    for _ in range(3):
        state_f, _ = cycle_full(state_f)
        state_h, _ = cycle_halo(state_h)
    np.testing.assert_allclose(np.asarray(state_h.traj),
                               np.asarray(state_f.traj), atol=1e-7)
    np.testing.assert_allclose(float(state_h.safety_agent_min),
                               float(state_f.safety_agent_min), atol=1e-8)


def test_ring_halo_with_spatial_sort_runs_collision_free(mesh):
    """Narrow halo window (view = 3/8 of the swarm) on a spatially sorted
    swarm with LOCAL interactions (head-on lane swaps): completes
    collision-free.  (A circle swap would be a counterexample by design:
    the whole swarm crowds the centre, so no sub-swarm window covers the
    interaction set -- halo exchange targets spread-out swarms.)"""
    from lsc_planner_tpu.missions import make_lane_mission
    mission = make_lane_mission(16, lane_gap=2.0, length=6.0)
    p = Param(goal_mode=GoalMode.PRIOR_BASED, qp_iterations=14,
              max_neighbors=4)
    sim = SyncSimulator(mission, p, dtype=jnp.float64)
    cycle = pshard.make_sharded_cycle(sim, mesh, halo_shards=1)
    wmin, wmax = sim.mission.world_min, sim.mission.world_max
    # the lane swarm is elongated along y -> axis sort keeps each lane
    # pair adjacent (a Z-order curve would split pairs straddling the
    # x=0 bit boundary exactly where they meet head-on)
    sort = jax.jit(lambda s: pshard.spatial_sort_state(s, wmin, wmax,
                                                       key="axis:1"))

    state = pshard.shard_state(sim.initial_state(), mesh)
    safety_min = np.inf
    for it in range(300):
        state = sort(state)
        state, info = cycle(state)
        safety_min = min(safety_min, float(info.safety_step_min))
        done = np.asarray(jnp.linalg.norm(
            state.pos - state.desired_goal, axis=-1)).max() \
            < p.goal_threshold
        if done:
            break
    assert done, "mission did not finish under ring-halo exchange"
    assert safety_min >= 1.0


def test_morton_sort_orders_spatially():
    rng = np.random.default_rng(0)
    pos = rng.uniform(-10, 10, size=(256, 3))
    codes = np.asarray(pshard.morton_codes(
        jnp.asarray(pos), np.array([-10.0, -10.0, -10.0]),
        np.array([10.0, 10.0, 10.0])))
    order = np.argsort(codes)
    sorted_pos = pos[order]
    step = np.linalg.norm(np.diff(sorted_pos, axis=0), axis=-1)
    rand_step = np.linalg.norm(np.diff(pos, axis=0), axis=-1)
    # Z-order neighbours must be far closer in space than random order
    assert np.median(step) < 0.5 * np.median(rand_step)


def test_sharded_run_completes(mesh):
    mission = make_circle_mission(8, radius=3.0,
                                  world=(-5, -5, 0, 5, 5, 2.5))
    p = Param(goal_mode=GoalMode.PRIOR_BASED, qp_iterations=14,
              qp_tol_gap=0.0, qp_tol_rp=0.0)
    sim = SyncSimulator(mission, p, dtype=jnp.float64)
    cycle = pshard.make_sharded_cycle(sim, mesh)
    # run with host loop but sharded cycle
    state = pshard.shard_state(sim.initial_state(), mesh)

    def cycle_fn(s):
        return cycle(s)

    summary = sim.run(max_iterations=300, cycle_fn=cycle_fn)
    assert summary["iterations"] < 300
    assert not summary["is_collided"]
    assert summary["safety_ratio_agent"] >= 1.0


def test_mesh2d_all_gather_matches_single(mesh):
    """(2 hosts x 4 chips) hierarchical mesh, full exchange: bit-identical
    to the single-device cycle (host-major agent order is the identity)."""
    mesh2d = pshard.make_mesh_2d(2, 4)
    mission = make_circle_mission(16, radius=4.0)
    p = Param(goal_mode=GoalMode.PRIOR_BASED, qp_iterations=14,
              qp_tol_gap=0.0, qp_tol_rp=0.0)
    sim = SyncSimulator(mission, p, dtype=jnp.float64)
    cycle2d = pshard.make_sharded_cycle(sim, mesh2d)

    state_s = pshard.shard_state(sim.initial_state(), mesh2d)
    state_1 = sim.initial_state()
    for _ in range(3):
        state_s, _ = cycle2d(state_s)
        state_1, _ = sim._cycle_jit(state_1)
    np.testing.assert_allclose(np.asarray(state_s.traj),
                               np.asarray(state_1.traj), atol=1e-8)
    np.testing.assert_allclose(float(state_s.distance),
                               float(state_1.distance), atol=1e-7)


def test_mesh2d_host_halo_full_window_matches(mesh):
    """On a (3 hosts x 2 chips) mesh with host_halo=1 the hierarchical
    view covers the whole swarm (3 host blocks), so it must agree with
    the full all_gather cycle up to constraint-row ordering."""
    mesh2d = pshard.make_mesh_2d(3, 2)
    mission = make_circle_mission(12, radius=4.0)
    p = Param(goal_mode=GoalMode.PRIOR_BASED, qp_iterations=14,
              qp_tol_gap=0.0, qp_tol_rp=0.0)
    sim = SyncSimulator(mission, p, dtype=jnp.float64)
    cycle_full = pshard.make_sharded_cycle(sim, mesh2d)
    cycle_halo = pshard.make_sharded_cycle(sim, mesh2d, halo_shards=1)

    state_f = pshard.shard_state(sim.initial_state(), mesh2d)
    state_h = pshard.shard_state(sim.initial_state(), mesh2d)
    for _ in range(3):
        state_f, _ = cycle_full(state_f)
        state_h, _ = cycle_halo(state_h)
    np.testing.assert_allclose(np.asarray(state_h.traj),
                               np.asarray(state_f.traj), atol=1e-7)
    np.testing.assert_allclose(float(state_h.safety_agent_min),
                               float(state_f.safety_agent_min), atol=1e-8)


def test_profile_sharded(mesh):
    """Sharded per-stage profiler returns sane timings for both the
    all_gather and ring-halo exchanges."""
    p = Param(goal_mode=GoalMode.PRIOR_BASED, qp_iterations=14)
    mission = make_circle_mission(16, radius=4.0)
    sim = SyncSimulator(mission, p, dtype=jnp.float64)
    mesh8 = pshard.make_mesh(8)
    prof = pshard.profile_sharded(sim, mesh8, n_cycles=2)
    assert prof["cycle_total"] > 0 and prof["exchange"] > 0
    assert prof["local_compute_est"] >= 0
    prof_h = pshard.profile_sharded(sim, mesh8, halo_shards=2,
                                    n_cycles=2)
    assert prof_h["cycle_total"] > 0
