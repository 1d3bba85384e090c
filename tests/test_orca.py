"""ORCA kernel + mode tests (RVO2-3D capability)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsc_planner_tpu.config import Param, PlannerMode, GoalMode
from lsc_planner_tpu.missions import make_circle_mission
from lsc_planner_tpu.ops import orca


def test_no_neighbors_returns_pref():
    pos = jnp.asarray([[0.0, 0, 1], [10.0, 10, 1]])
    vel = jnp.zeros((2, 3))
    pref = jnp.asarray([[1.0, 0, 0], [0.0, 1, 0]])
    v = orca.orca_velocities(pos, vel, jnp.full((2,), 0.2), pref,
                             jnp.full((2,), 1.0),
                             jnp.zeros(2, bool), 2.0, 0.5,
                             neighbor_dist=5.0)
    np.testing.assert_allclose(np.asarray(v), np.asarray(pref), atol=1e-5)


def test_head_on_symmetric_avoidance():
    """Two agents head-on: ORCA velocities must satisfy the constraint that
    relative velocity exits the truncated collision cone, symmetrically."""
    # slight lateral offset: the exact head-on case is degenerate (the
    # relative velocity sits on the cone axis; the reference's unitW is
    # 0/0 there too -- RVO relies on symmetry-breaking noise)
    pos = jnp.asarray([[-1.0, 0.005, 1], [1.0, -0.005, 1]])
    vel = jnp.asarray([[1.0, 0, 0], [-1.0, 0, 0]])
    pref = vel
    r = jnp.full((2,), 0.3)
    v = np.asarray(orca.orca_velocities(pos, vel, r, pref,
                                        jnp.full((2,), 1.0),
                                        jnp.zeros(2, bool), 2.0, 0.5))
    # symmetric: v0 = -v1 reflected
    np.testing.assert_allclose(v[0, 0], -v[1, 0], atol=1e-4)
    np.testing.assert_allclose(v[0, 1], -v[1, 1], atol=1e-4)
    # sidesteps: nonzero lateral component, reduced closing speed
    rel_closing = v[0, 0] - v[1, 0]
    assert rel_closing < 2.0 - 1e-3
    assert abs(v[0, 1]) > 1e-4
    # speed cap respected
    assert (np.linalg.norm(v, axis=1) <= 1.0 + 1e-5).all()


def test_plane_constraints_satisfied_when_feasible():
    rng = np.random.default_rng(0)
    N, O = 8, 5
    pos = jnp.asarray(rng.uniform(-3, 3, (N, 3)))
    vel = jnp.asarray(rng.uniform(-0.5, 0.5, (N, 3)))
    pref = jnp.asarray(rng.uniform(-1, 1, (N, 3)))
    r = jnp.full((N,), 0.2)
    v = orca.orca_velocities(pos, vel, r, pref, jnp.full((N,), 1.0),
                             jnp.zeros(N, bool), 2.0, 0.5)
    # rebuild planes and check: n . (v - point) >= -tol  (when feasible)
    d2 = np.sum((np.asarray(pos)[None] - np.asarray(pos)[:, None])**2, -1)
    np.fill_diagonal(d2, np.inf)
    K = min(10, N - 1)
    nbr = np.argsort(d2, axis=1)[:, :K]
    planes = orca.build_orca_planes(
        pos, vel, r, pos[jnp.asarray(nbr)], vel[jnp.asarray(nbr)],
        r[jnp.asarray(nbr)], jnp.zeros((N, K), bool),
        jnp.asarray(np.take_along_axis(d2, nbr, 1) < 225.0),
        2.0, 0.5)
    margin = np.einsum("nod,nod->no",
                       np.asarray(planes.normal),
                       np.asarray(v)[:, None] - np.asarray(planes.point))
    margin = np.where(np.asarray(planes.valid), margin, 0.0)
    assert margin.min() > -1e-4


def test_orca_planner_mode_e2e():
    """Rotational exchange: each agent's goal is the next agent's start.

    The antipodal circle swap is ORCA's known pathological case (symmetric
    reciprocal standstill -- the failure mode the LSC paper targets, and
    why the reference carries commented-out symmetry-breaking noise);
    rotational flows are the scenario ORCA handles well.
    """
    mission = make_circle_mission(6, radius=3.0,
                                  world=(-5, -5, 0, 5, 5, 2.5))
    starts = [a.start for a in mission.agents]
    for qi, a in enumerate(mission.agents):
        a.goal = starts[(qi + 2) % 6].copy()
    p = Param(planner_mode=PlannerMode.ORCA, goal_mode=GoalMode.STATIC)
    from lsc_planner_tpu.sim.simulator import SyncSimulator
    sim = SyncSimulator(mission, p, dtype=jnp.float64)
    summary = sim.run(max_iterations=400)
    assert summary["iterations"] < 400, "ORCA did not converge to goals"
    # ORCA in discrete time is not hard-safe like LSC; require no gross
    # penetration
    assert summary["safety_ratio_agent"] > 0.75
