"""Golden tests for the f32 guard band (VERDICT r4 next-#7).

The guard band (lsc_planes / sfc_planes, planner/constraints.py) inflates
every LSC/SFC row's margin by ``min(guard_margin, s0/2)`` where s0 is that
row's slack at the initial trajectory.  The clamp is what keeps the
shifted-previous-solution feasibility lemma intact (remaining slack
>= s0/2 >= 0), so these tests pin (a) the exact added margin against
hand-derived values including the clamp region, (b) the feasibility lemma
under guard, also in f32 at large coordinates (the congested regime the
guard was added for), and (c) the SFC face case.  Reference contract
being strengthened: traj_planner.cpp:1388-1394 margins (CPLEX needs no
guard; a capped f32 IPM does).
"""
import numpy as np
import jax.numpy as jnp

from lsc_planner_tpu.planner import constraints as cons

M, N1 = 2, 6
GUARD = 0.004


def _planes(agent_cp, obs_cp, r_a, r_o, dtype=jnp.float64, guard=GUARD):
    init = jnp.asarray(agent_cp, dtype)[None]
    obs = jnp.asarray(obs_cp, dtype)[None, None]
    return cons.lsc_planes(
        init, obs,
        agent_radius=jnp.asarray([r_a], dtype),
        agent_downwash=jnp.asarray([1.0], dtype),
        obs_radius=jnp.asarray([[r_o]], dtype),
        obs_downwash=jnp.asarray([[1.0]], dtype),
        obs_is_agent=jnp.asarray([[True]]),
        obs_mask=jnp.asarray([[True]]),
        guard_margin=guard)


def test_guarded_d_values_clamp_region():
    """Axis-separated pair at several gaps delta = rel_x - r_sum: the
    added margin must be exactly min(GUARD, delta/4) -- the clamp is
    min(guard, s0/2) with s0 = (rel.n - r_sum)/2 = delta/2."""
    r_a, r_o = 0.15, 0.2
    r_sum = r_a + r_o
    for delta in (0.0, 0.004, 0.008, 0.016, 0.1, 1.0):
        agent_cp = np.zeros((M, N1, 3))
        agent_cp[..., 0] = r_sum + delta
        obs_cp = np.zeros((M, N1, 3))
        planes = _planes(agent_cp, obs_cp, r_a, r_o)
        rhs = np.asarray(planes.rhs)[0, 0]
        d_unguarded = 0.5 * (r_sum + (r_sum + delta))
        guard_add = min(GUARD, delta / 4.0)
        np.testing.assert_allclose(
            rhs, np.full((M, N1), d_unguarded + guard_add), atol=1e-12,
            err_msg=f"delta={delta}")


def test_guarded_feasibility_lemma():
    """Under guard, the initial trajectory satisfies every guarded row
    with slack >= s0/2 >= 0 EXACTLY (the lemma the clamp preserves):
    randomized configs including near-touching ones."""
    rng = np.random.default_rng(11)
    r_a = r_o = 0.15
    r_sum = r_a + r_o
    checked_near = 0
    for _ in range(40):
        dirn = rng.normal(size=3)
        dirn /= np.linalg.norm(dirn)
        # bias half the draws into the near-touching guard-clamp regime
        gap = rng.uniform(0.0, 0.01) if rng.uniform() < 0.5 else \
            rng.uniform(0.01, 1.0)
        base = dirn * (r_sum + gap)
        agent_cp = base + rng.normal(size=(M, N1, 3)) * (gap * 0.1)
        obs_cp = rng.normal(size=(M, N1, 3)) * (gap * 0.1)
        rel = agent_cp - obs_cp
        if np.linalg.norm(rel, axis=-1).min() <= r_sum:
            continue
        if gap < 0.01:
            checked_near += 1
        planes = _planes(agent_cp, obs_cp, r_a, r_o)
        normal = np.asarray(planes.normal)[0, 0]
        rhs = np.asarray(planes.rhs)[0, 0]
        lhs = np.einsum("mid,md->mi", agent_cp, normal)
        slack = lhs - rhs
        e = np.einsum("mid,md->mi", rel, normal)
        s0 = 0.5 * (e - r_sum)
        # remaining slack after the guard: s0 - min(guard, s0/2) >= s0/2
        assert (slack - 0.5 * s0).min() > -1e-9
        assert slack.min() > -1e-9
    assert checked_near >= 5


def test_guarded_feasibility_f32_large_coordinates():
    """The guard's raison d'etre: f32 rows built at ~150 m coordinates
    for a near-touching pair.  The guarded rows must still be satisfied
    by the initial trajectory to within f32 evaluation error (<< the
    guard itself), i.e. the guard may never make the warm start
    infeasible at the scales where it actually operates."""
    r_a = r_o = 0.15
    r_sum = r_a + r_o
    offset = np.asarray([148.0, -148.0, 1.5])
    for gap in (0.002, 0.02, 0.2):
        agent_cp = np.tile(offset + [r_sum + gap, 0, 0], (M, N1, 1))
        obs_cp = np.tile(offset, (M, N1, 1))
        planes = _planes(agent_cp, obs_cp, r_a, r_o, dtype=jnp.float32)
        normal = np.asarray(planes.normal, np.float64)[0, 0]
        rhs = np.asarray(planes.rhs, np.float64)[0, 0]
        lhs = np.einsum("mid,md->mi", agent_cp, normal)
        # guarded slack should be ~gap/2 - min(guard, gap/4); f32 noise
        # at 148 m is ~1e-5 -- far below both
        expect = 0.5 * gap - min(GUARD, gap / 4.0)
        assert (lhs - rhs).min() > expect - 5e-5


def test_sfc_guard_face_case():
    """SFC faces: rhs is pulled in by min(guard, s0/2) per control
    point, s0 = that point's distance to the face."""
    box = jnp.asarray([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0]])      # (1, 6)
    boxes = jnp.tile(box[:, None], (1, M, 1))                # (1, M, 6)
    init = np.full((1, M, N1, 3), 0.5)
    init[0, :, 0, 0] = 0.001          # first ctrl pt 1 mm off face x=0
    planes = cons.sfc_planes(boxes, jnp.asarray([True]),
                             init_traj=jnp.asarray(init),
                             guard_margin=GUARD)
    rhs = np.asarray(planes.rhs)      # (1, 6, M, N1)
    # +x face (normal +e_x, rhs base 0): ctrl 0 -> s0 = 1e-3, add 5e-4;
    # others -> s0 = 0.5, add GUARD
    np.testing.assert_allclose(rhs[0, 0, :, 0], 0.0005, atol=1e-12)
    np.testing.assert_allclose(rhs[0, 0, :, 1:], GUARD, atol=1e-12)
    # -x face (normal -e_x, rhs base -1): every point 0.5 from it
    np.testing.assert_allclose(rhs[0, 3, :, 1:], -1.0 + GUARD, atol=1e-12)
    # the guarded planes still admit the initial points
    lhs0 = np.einsum("kd,nmid->nkmi", np.asarray(planes.normal)[0, :, 0],
                     init)
    assert (lhs0 - rhs).min() > -1e-12
