"""Golden-value LSC constraint tests, hand-derived from the reference.

The d-margin formula (generateLSC, traj_planner.cpp:1388-1394):

    d_i = 0.5 * (r_a + r_o + (p_a_i' - p_o_i') . n)

with p' the downwash-transformed control points (z scaled by 1/dw,
coordinateTransform util.hpp:231-240), n the hull closest-point direction
between the relative control points, and the exported normal's z divided
by dw again (traj_planner.cpp:1403).  These vectors are computed by hand
for analytically-solvable geometries and compared against
``planner.constraints.lsc_planes`` bit-for-bit (f64).
"""
import numpy as np
import jax.numpy as jnp

from lsc_planner_tpu.planner import constraints as cons

M, N1 = 2, 6      # segments, control points per segment


def _planes(agent_cp, obs_cp, r_a, r_o, dw_a, dw_o, is_agent=True):
    """One agent vs one obstacle; control points (M, N1, 3)."""
    init = jnp.asarray(agent_cp, jnp.float64)[None]          # (1,M,N1,3)
    obs = jnp.asarray(obs_cp, jnp.float64)[None, None]       # (1,1,M,N1,3)
    return cons.lsc_planes(
        init, obs,
        agent_radius=jnp.asarray([r_a], jnp.float64),
        agent_downwash=jnp.asarray([dw_a], jnp.float64),
        obs_radius=jnp.asarray([[r_o]], jnp.float64),
        obs_downwash=jnp.asarray([[dw_o]], jnp.float64),
        obs_is_agent=jnp.asarray([[is_agent]]),
        obs_mask=jnp.asarray([[True]]))


def test_lsc_d_values_axis_separated():
    """Pure x-separation, no downwash: n = +x and
    d_i = 0.5 (r_a + r_o + rel_x_i) exactly."""
    r_a, r_o = 0.15, 0.2
    # agent control points march 2.0 -> 3.1 along x; obstacle fixed at
    # x = 0.5 -- relative points all along +x, so the hull closest point
    # is the smallest rel_x and the normal is exactly +x
    ax = 2.0 + 0.1 * np.arange(M * N1).reshape(M, N1)
    agent_cp = np.zeros((M, N1, 3))
    agent_cp[..., 0] = ax
    obs_cp = np.zeros((M, N1, 3))
    obs_cp[..., 0] = 0.5

    planes = _planes(agent_cp, obs_cp, r_a, r_o, 1.0, 1.0)
    normal = np.asarray(planes.normal)[0, 0]                 # (M, 3)
    rhs = np.asarray(planes.rhs)[0, 0]                       # (M, N1)

    np.testing.assert_allclose(normal, [[1.0, 0, 0]] * M, atol=1e-12)
    # hand-derived margin (traj_planner.cpp:1392-1393)
    rel_x = ax - 0.5
    d = 0.5 * (r_a + r_o + rel_x)
    # rhs_i = d_i + n . p_obs_i = d_i + 0.5
    np.testing.assert_allclose(rhs, d + 0.5, atol=1e-12)
    # the plane must separate: agent side satisfies n.p >= rhs with
    # exactly half the gap + collision radius as margin
    np.testing.assert_allclose(ax - rhs, 0.5 * (rel_x - (r_a + r_o)),
                               atol=1e-12)


def test_lsc_d_values_downwash_vertical():
    """Pure z-separation with downwash: the transform scales z by 1/dw
    with dw = (r_a dw_a + r_o dw_o) / (r_a + r_o) for agent pairs
    (traj_planner.cpp:1336-1340); n' = +z in transformed space and the
    exported normal has n_z = 1/dw (unnormalized, :1403)."""
    r_a = r_o = 0.15
    dw_a, dw_o = 2.0, 3.0
    dz = 1.2
    agent_cp = np.zeros((M, N1, 3))
    agent_cp[..., 2] = dz
    obs_cp = np.zeros((M, N1, 3))

    planes = _planes(agent_cp, obs_cp, r_a, r_o, dw_a, dw_o)
    normal = np.asarray(planes.normal)[0, 0]
    rhs = np.asarray(planes.rhs)[0, 0]

    dw = (r_a * dw_a + r_o * dw_o) / (r_a + r_o)             # = 2.5
    assert abs(dw - 2.5) < 1e-12
    # transformed relative z and margin
    rel_z_t = dz / dw
    d = 0.5 * (r_a + r_o + rel_z_t)
    np.testing.assert_allclose(normal, [[0, 0, 1.0 / dw]] * M,
                               atol=1e-12)
    # rhs = d + n . p_obs = d (obstacle at origin)
    np.testing.assert_allclose(rhs, np.full((M, N1), d), atol=1e-12)
    # the agent's own control points satisfy the plane with margin
    # n.p_a - rhs = dz/dw - d = 0.5 (rel_z_t - 2 r)
    np.testing.assert_allclose(
        agent_cp[..., 2] / dw - rhs,
        np.full((M, N1), 0.5 * (rel_z_t - (r_a + r_o))), atol=1e-12)


def test_lsc_d_values_oblique():
    """Oblique constant separation: n is the unit relative direction and
    every d_i = 0.5 (r_a + r_o + |rel|)."""
    r_a, r_o = 0.1, 0.3
    sep = np.array([0.6, -0.8, 0.0])          # |sep| = 1.0, planar
    agent_cp = np.tile(sep, (M, N1, 1))
    obs_cp = np.zeros((M, N1, 3))

    planes = _planes(agent_cp, obs_cp, r_a, r_o, 1.0, 1.0)
    normal = np.asarray(planes.normal)[0, 0]
    rhs = np.asarray(planes.rhs)[0, 0]

    np.testing.assert_allclose(normal, np.tile(sep, (M, 1)), atol=1e-9)
    d = 0.5 * (r_a + r_o + 1.0)
    np.testing.assert_allclose(rhs, np.full((M, N1), d), atol=1e-9)


def test_lsc_feasibility_guarantee():
    """The LSC feasibility property (the paper's core lemma): the
    agent's OWN initial-trajectory control points always satisfy their
    LSC planes when the pair is collision-free, because
    rel_i . n - d_i = 0.5 (rel_i . n - r_a - r_o) and rel_i . n >=
    hull-closest-point distance >= r_a + r_o.  Randomized check."""
    rng = np.random.default_rng(7)
    for _ in range(20):
        base = rng.normal(size=3) * 2.0
        base = base / np.linalg.norm(base) * (0.9 + rng.uniform())
        agent_cp = base + rng.normal(size=(M, N1, 3)) * 0.05
        obs_cp = rng.normal(size=(M, N1, 3)) * 0.05
        r_a = r_o = 0.15
        # only keep collision-free configurations (|rel| > r_a + r_o)
        rel = agent_cp - obs_cp
        if np.linalg.norm(rel, axis=-1).min() <= r_a + r_o:
            continue
        planes = _planes(agent_cp, obs_cp, r_a, r_o, 1.0, 1.0)
        normal = np.asarray(planes.normal)[0, 0]             # (M, 3)
        rhs = np.asarray(planes.rhs)[0, 0]                   # (M, N1)
        lhs = np.einsum("mid,md->mi", agent_cp, normal)
        assert (lhs - rhs).min() > -1e-9
