"""Tests for auxiliary subsystems: obstacle models, KF, logging, replay,
command sampler, CLI."""
import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from lsc_planner_tpu.config import Param
from lsc_planner_tpu.missions import ObstacleSpec, make_circle_mission
from lsc_planner_tpu.sim import obstacles as obs_mod
from lsc_planner_tpu.sim.kalman import LinearKalmanFilter


def test_spin_obstacle():
    spec = ObstacleSpec(kind="spin", size=0.3, max_acc=10.0, downwash=1.0,
                        axis_position=np.array([0.0, 0, 1]),
                        axis_ori=np.array([0.0, 0, 1]),
                        start=np.array([1.0, 0, 1]), speed=1.0)
    m = obs_mod.SpinObstacle(spec)
    p0, v0 = m.state(0.0)
    np.testing.assert_allclose(p0, [1, 0, 1], atol=1e-12)
    np.testing.assert_allclose(v0, [0, 1, 0], atol=1e-12)
    # quarter circle at speed 1, radius 1: t = pi/2
    p1, v1 = m.state(np.pi / 2)
    np.testing.assert_allclose(p1, [0, 1, 1], atol=1e-9)
    np.testing.assert_allclose(v1, [-1, 0, 0], atol=1e-9)
    # speed preserved
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-9


def test_straight_and_patrol():
    spec = ObstacleSpec(kind="straight", size=0.2, downwash=1.0,
                        start=np.array([0.0, 0, 1]),
                        goal=np.array([2.0, 0, 1]), speed=1.0)
    m = obs_mod.StraightObstacle(spec)
    p, v = m.state(1.0)
    np.testing.assert_allclose(p, [1, 0, 1])
    p, v = m.state(5.0)        # stopped at goal
    np.testing.assert_allclose(p, [2, 0, 1])
    np.testing.assert_allclose(v, 0)

    pspec = ObstacleSpec(kind="multisim_patrol", size=0.2, downwash=1.0,
                         waypoints=np.array([[0.0, 0, 1], [2.0, 0, 1]]),
                         speed=1.0)
    pm = obs_mod.PatrolObstacle(pspec)
    p, _ = pm.state(3.0)       # leg back: 2 -> 0 at t=3 -> x=1
    np.testing.assert_allclose(p, [1, 0, 1], atol=1e-9)
    p, _ = pm.state(4.0 + 0.5)  # wrapped into first leg again
    np.testing.assert_allclose(p, [0.5, 0, 1], atol=1e-9)


def test_gaussian_obstacle_replayable():
    spec = ObstacleSpec(kind="gaussian", size=0.2, max_acc=1.0,
                        downwash=1.0, start=np.array([0.0, 0, 1]),
                        initial_vel=np.array([0.5, 0, 0]), max_vel=1.0,
                        stddev_acc=0.5, acc_update_cycle=0.1)
    m = obs_mod.GaussianObstacle(spec, seed=7)
    p1, v1 = m.state(2.0)
    m2 = obs_mod.GaussianObstacle(spec, seed=7)
    p2, v2 = m2.state(2.0)
    np.testing.assert_allclose(p1, p2)
    assert np.linalg.norm(v1) <= 1.0 + 1e-9


def test_kalman_filter_tracks_constant_velocity():
    kf = LinearKalmanFilter(2, sigma_y_sq=1e-4, sigma_a_sq=0.1)
    rng = np.random.default_rng(0)
    v_true = np.array([[1.0, 0, 0], [0, -0.5, 0.2]])
    p0 = np.array([[0.0, 0, 1], [1.0, 1, 1]])
    for k in range(60):
        t = 0.1 * k
        obs = p0 + v_true * t + rng.normal(0, 0.01, (2, 3))
        pos, vel = kf.filter(obs, t)
    np.testing.assert_allclose(vel, v_true, atol=0.1)
    r = kf.uncertainty_radius(1.0)
    assert (r > 0).all() and (r < 2.0).all()


def test_logging_and_replay_roundtrip(tmp_path):
    from lsc_planner_tpu.sim.simulator import SyncSimulator
    from lsc_planner_tpu.sim.logging import ResultLogger, append_summary
    from lsc_planner_tpu.sim.replay import read_result_csv, compare_runs

    mission = make_circle_mission(4, radius=2.0,
                                  world=(-4, -4, 0, 4, 4, 2.5))
    p = Param(qp_iterations=10)
    sim = SyncSimulator(mission, p, dtype=jnp.float64)
    log = ResultLogger(str(tmp_path), sim.param, mission.qn)
    summary = sim.run(max_iterations=60, log=log)
    path = append_summary(str(tmp_path), sim.param, mission.qn, summary,
                          mission_file="circle4")
    assert os.path.exists(log.path)
    data = read_result_csv(log.path)
    assert data.qn == 4
    assert len(data.t) > 10
    # start positions match the mission
    np.testing.assert_allclose(
        data.pos[0], np.stack([a.start for a in mission.agents]),
        atol=1e-5)
    # self-compare is exact
    metrics = compare_runs(data, data)
    assert metrics["max_pos_err"] == 0.0
    with open(path) as f:
        lines = f.read().strip().splitlines()
    assert lines[0].startswith("start_time,total_flight_time")
    assert len(lines) == 2


def test_command_sampler():
    from lsc_planner_tpu.sim.command import CommandSampler
    p = Param()
    cs = CommandSampler(p)
    traj = np.zeros((2, p.M, p.n + 1, 3))
    traj[0, :, :, 0] = np.linspace(0, 1, p.M * (p.n + 1)).reshape(
        p.M, p.n + 1)
    cs.push(0.0, traj)
    out = cs.sample(0.1)
    assert out is not None
    assert out["pos"].shape == (2, 3)
    assert 0.0 < out["pos"][0, 0] < 1.0
    # queued batch activates later
    cs.push(0.2, np.ones_like(traj))
    out2 = cs.sample(0.25)
    np.testing.assert_allclose(out2["pos"][0], [1, 1, 1], atol=1e-6)


def test_cli_generate_and_run(tmp_path):
    from lsc_planner_tpu import cli
    out = str(tmp_path / "m.json")
    cli.main(["--generate", "circle:4", "--out", out])
    assert os.path.exists(out)
    from lsc_planner_tpu.missions import load_mission
    m = load_mission(out)
    assert m.qn == 4
    # run it briefly
    rc = cli.main(["--mission", out, "--max-iterations", "3",
                   "--dtype", "float64",
                   "--set", "qp_iterations=8"])
    assert rc is None or rc == 0


def test_visualize_run(tmp_path):
    from lsc_planner_tpu.sim.simulator import SyncSimulator
    from lsc_planner_tpu.sim.logging import ResultLogger
    from lsc_planner_tpu.sim.replay import read_result_csv
    from lsc_planner_tpu.sim.visualize import plot_run, save_normal_vector_csv
    mission = make_circle_mission(3, radius=2.0,
                                  world=(-4, -4, 0, 4, 4, 2.5))
    p = Param(qp_iterations=10)
    sim = SyncSimulator(mission, p, dtype=jnp.float64)
    log = ResultLogger(str(tmp_path), sim.param, mission.qn)
    sim.run(max_iterations=40, log=log)
    data = read_result_csv(log.path)
    out = plot_run(data, str(tmp_path / "run.png"),
                   world_min=mission.world_min, world_max=mission.world_max,
                   max_vel=1.0, max_acc=2.0)
    assert os.path.getsize(out) > 10000
    # normal-vector research CSV
    nrm = [np.zeros((3, 3, 3)) for _ in range(2)]
    path = save_normal_vector_csv(str(tmp_path / "normals.csv"),
                                  [0, 1], nrm, 3)
    lines = open(path).read().strip().splitlines()
    assert lines[0] == "t,(0-1),(0-2),(1-2)"
    assert len(lines) == 3


def test_greedy_initial_mode():
    from lsc_planner_tpu.config import InitialTrajMode, PlannerMode
    from lsc_planner_tpu.sim.simulator import SyncSimulator
    mission = make_circle_mission(3, radius=2.0,
                                  world=(-4, -4, 0, 4, 4, 2.5))
    p = Param(planner_mode=PlannerMode.RECIPROCAL_RSFC,
              qp_iterations=12)
    sim = SyncSimulator(mission, p, dtype=jnp.float64)
    sim.param.initial_traj_mode = InitialTrajMode.GREEDY
    summary = sim.run(max_iterations=250)
    assert summary["iterations"] < 250


def test_continuous_safety_ratio_lower_bounds_sampled(rng):
    """Continuous-time audit is a lower bound of any sampled audit and
    tight against dense sampling."""
    import jax
    from lsc_planner_tpu.sim import audit
    from lsc_planner_tpu.ops import bernstein as bz
    N, M, n = 4, 5, 5
    base = rng.normal(size=(N, 1, 1, 3)) * 3.0
    trajs = jnp.asarray(base + rng.normal(size=(N, M, n + 1, 3)) * 0.5)
    # make the piecewise curve continuous across segments
    trajs = trajs.at[:, 1:, 0].set(trajs[:, :-1, -1])
    radius = jnp.asarray(rng.uniform(0.1, 0.3, size=N))
    downwash = jnp.asarray(rng.uniform(1.0, 2.0, size=N))

    cont = float(audit.continuous_safety_ratio(trajs, radius, downwash))

    ts = np.linspace(0, 1, 2001)
    pos = np.asarray(jax.vmap(
        lambda t: bz.bernstein_eval(trajs, t))(jnp.asarray(ts)))
    pos = pos.reshape(len(ts), N, M, 3)
    r_sum = np.asarray(radius)[:, None] + np.asarray(radius)[None, :]
    dw = (np.asarray(downwash)[:, None] * np.asarray(radius)[:, None] +
          np.asarray(downwash)[None, :] * np.asarray(radius)[None, :]) / r_sum
    delta = pos[:, :, None, :, :] - pos[:, None, :, :, :]  # (T,N,N,M,3)
    dist = np.sqrt(delta[..., 0]**2 + delta[..., 1]**2 +
                   (delta[..., 2] / dw[None, :, :, None])**2)
    ratio = dist / r_sum[None, :, :, None]
    ratio[:, np.arange(N), np.arange(N), :] = np.inf
    sampled = float(ratio.min())
    assert cont <= sampled + 1e-9
    assert cont >= sampled - 1e-3


# --- geometry parity tail (geometry.hpp:172-235, :497-551, :553-708) ---

def test_segment_segment_closest_points(rng):
    """Exact clamped parametric solution vs a dense-sampling oracle."""
    from lsc_planner_tpu.ops import geometry as geo
    import jax.numpy as jnp
    a0 = rng.normal(size=(40, 3)); a1 = rng.normal(size=(40, 3))
    b0 = rng.normal(size=(40, 3)); b1 = rng.normal(size=(40, 3))
    pa, pb, dist = geo.closest_between_segments(
        jnp.asarray(a0), jnp.asarray(a1), jnp.asarray(b0),
        jnp.asarray(b1))
    ts = np.linspace(0, 1, 401)
    for k in range(40):
        P = a0[k][None] + ts[:, None] * (a1[k] - a0[k])[None]
        Q = b0[k][None] + ts[:, None] * (b1[k] - b0[k])[None]
        d_oracle = np.min(np.linalg.norm(P[:, None] - Q[None], axis=-1))
        assert float(dist[k]) <= d_oracle + 1e-9
        # returned points lie on the segments and realize the distance
        np.testing.assert_allclose(
            float(jnp.linalg.norm(pa[k] - pb[k])), float(dist[k]),
            atol=1e-9)


def test_segment_box_collision_golden():
    from lsc_planner_tpu.ops import geometry as geo
    import jax.numpy as jnp
    bmin = jnp.asarray([[-1.0, -1.0, -1.0]])
    bmax = jnp.asarray([[1.0, 1.0, 1.0]])
    r = jnp.asarray([0.25])
    # straight through the box
    assert bool(geo.segment_box_collision(
        jnp.asarray([[-3.0, 0, 0]]), jnp.asarray([[3.0, 0, 0]]),
        bmin, bmax, r)[0])
    # grazing the inflated corner diagonally OUTSIDE the true swept
    # sphere: passes the slab test but not the exact distance check
    assert not bool(geo.segment_box_collision(
        jnp.asarray([[-3.0, 1.23, 1.23]]), jnp.asarray([[3.0, 1.23, 1.23]]),
        bmin, bmax, r)[0])
    # parallel to a face just inside the margin
    assert bool(geo.segment_box_collision(
        jnp.asarray([[-3.0, 1.2, 0.0]]), jnp.asarray([[3.0, 1.2, 0.0]]),
        bmin, bmax, r)[0])
    # static point far away
    assert not bool(geo.segment_box_collision(
        jnp.asarray([[4.0, 0, 0]]), jnp.asarray([[4.0, 0, 0]]),
        bmin, bmax, r)[0])


def test_box_collision_time_golden():
    from lsc_planner_tpu.ops import geometry as geo
    import jax.numpy as jnp
    bmin = jnp.asarray([1.0, -1.0, -1.0])
    bmax = jnp.asarray([2.0, 1.0, 1.0])
    r = jnp.asarray(0.5)
    # head-on along +x from x=-1: face at 1, inflated face at 0.5;
    # travel 4 m over horizon 1 -> hits sphere-contact at t = 1.5/4
    t = geo.box_collision_time(jnp.asarray([-1.0, 0, 0]),
                               jnp.asarray([3.0, 0, 0]),
                               bmin, bmax, r, 1.0)
    np.testing.assert_allclose(float(t), 1.5 / 4.0, atol=1e-6)
    # miss
    t = geo.box_collision_time(jnp.asarray([-1.0, 3.0, 0]),
                               jnp.asarray([3.0, 3.0, 0]),
                               bmin, bmax, r, 1.0)
    assert np.isinf(float(t))


def test_safe_dist_in_direction_golden():
    from lsc_planner_tpu.ops import geometry as geo
    import jax.numpy as jnp
    pos = jnp.asarray([0.0, 0.0, 0.0])
    dirn = jnp.asarray([1.0, 0.0, 0.0])
    obs = jnp.asarray([[3.0, 0.3, 0.0], [10.0, 5.0, 0.0]])
    orad = jnp.asarray([0.2, 0.2])
    r = jnp.asarray(0.2)
    # r_sum = 0.4, perp = 0.3 -> backoff = sqrt(0.16 - 0.09) = 0.2646
    d = geo.safe_dist_in_direction(pos, dirn, obs, orad, r)
    np.testing.assert_allclose(float(d), 3.0 - np.sqrt(0.07), atol=1e-6)
    # with a box 2 m ahead (face at 2, inflated 1.8)
    boxes = jnp.asarray([[2.0, -1.0, -1.0, 4.0, 1.0, 1.0]])
    d = geo.safe_dist_in_direction(pos, dirn, obs, orad, r, boxes=boxes)
    np.testing.assert_allclose(float(d), 1.8, atol=1e-5)
