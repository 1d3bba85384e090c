"""Round-trip tests for the dynamic_msgs schema analog (sim/msgs.py)."""
import numpy as np

from lsc_planner_tpu.sim import msgs


def test_trajectory_roundtrip(rng, tmp_path):
    trajs = rng.normal(size=(4, 5, 6, 3))
    arr = msgs.TrajectoryArray.from_swarm(7, trajs, 0.2)
    assert arr.trajectories[0].M == 5 and arr.trajectories[0].n == 5
    path = str(tmp_path / "trajs.json")
    msgs.dump_json(arr, path)
    back = msgs.load_json(msgs.TrajectoryArray, path)
    np.testing.assert_allclose(back.to_array(), trajs, atol=1e-12)
    assert back.planner_seq == 7


def test_state_obstacle_roundtrip(tmp_path):
    st = msgs.State(id=3, planner_seq=11, pos=[1, 2, 3], vel=[0, 0, 0],
                    acc=[0, 0, 0])
    assert msgs.State.from_dict(st.to_dict()) == st
    oa = msgs.ObstacleArray(start_time=1.5, obstacles=[
        msgs.Obstacle(id=0, type="agent", pos=[0, 0, 1], vel=[1, 0, 0],
                      goal_point=[5, 0, 1], radius=0.15, downwash=2.0),
        msgs.Obstacle(id=1, type="static", pos=[2, 2, 1], vel=[0, 0, 0],
                      goal_point=[2, 2, 1], radius=0.5,
                      dimensions=[0.5, 0.5, 1.0])])
    path = str(tmp_path / "obs.json")
    msgs.dump_json(oa, path)
    back = msgs.load_json(msgs.ObstacleArray, path)
    assert back == oa


def test_collision_constraint_export(rng):
    C, M, n1 = 2, 5, 6
    obs_pred = rng.normal(size=(C, M, n1, 3))
    normal = rng.normal(size=(C, M, 3))
    d = rng.normal(size=(C, M, n1))
    boxes = rng.normal(size=(M, 6))
    msg = msgs.CollisionConstraint.from_planes(4, 1, obs_pred, normal, d,
                                               boxes)
    d2 = msgs.CollisionConstraint.from_dict(msg.to_dict())
    np.testing.assert_allclose(
        d2.rsfcs[1][2]["obs_control_points"], obs_pred[1, 2], atol=1e-12)
    np.testing.assert_allclose(d2.sfcs[3]["box_min"], boxes[3, :3],
                               atol=1e-12)
