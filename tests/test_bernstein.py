"""Golden-value tests for the Bernstein kernel library.

Reference formulas: include/polynomial.hpp; Q-Gram cross-checked against the
shipped CPLEX dump /root/reference/log/QPmodel.lp (coefficient 45000 on
z_0_0^2 = 2 * w_ci * Q_base[0,0] with w_ci = 0.01, dt = 0.2).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsc_planner_tpu.ops import bernstein as bz


def test_basis_partition_of_unity():
    t = jnp.linspace(0.0, 1.0, 11)
    basis = bz.bernstein_basis(5, t)
    np.testing.assert_allclose(np.sum(basis, axis=-1), 1.0, atol=1e-12)


def test_eval_endpoints(rng):
    ctrl = jnp.asarray(rng.normal(size=(6, 3)))
    np.testing.assert_allclose(bz.bernstein_eval(ctrl, 0.0), ctrl[0],
                               atol=1e-12)
    np.testing.assert_allclose(bz.bernstein_eval(ctrl, 1.0), ctrl[-1],
                               atol=1e-12)


def test_eval_matches_de_casteljau(rng):
    ctrl = np.asarray(rng.normal(size=(6, 2)))
    t = 0.37

    def de_casteljau(pts, t):
        pts = pts.copy()
        while len(pts) > 1:
            pts = [(1 - t) * pts[i] + t * pts[i + 1]
                   for i in range(len(pts) - 1)]
        return pts[0]

    expected = de_casteljau(list(ctrl), t)
    np.testing.assert_allclose(bz.bernstein_eval(jnp.asarray(ctrl), t),
                               expected, atol=1e-12)


def test_derivative_ctrl_matches_fd(rng):
    ctrl = jnp.asarray(rng.normal(size=(6, 3)))
    dt = 0.2
    vel_c = bz.derivative_ctrl(ctrl, dt)
    h = 1e-7
    for t in (0.2, 0.55, 0.9):
        fd = (bz.bernstein_eval(ctrl, t + h) -
              bz.bernstein_eval(ctrl, t - h)) / (2 * h) / dt
        np.testing.assert_allclose(bz.bernstein_eval(vel_c, t), fd,
                                   rtol=1e-5, atol=1e-5)


def test_traj_state_continuity(rng):
    """Flat-output state extraction across segment boundaries."""
    M, n, dt = 5, 5, 0.2
    # make a C^2 trajectory via elimination basis from the optimizer
    from lsc_planner_tpu.planner.optimizer import _build_equality_basis
    F, G, _ = _build_equality_basis(M, n, 3, dt, stop_at_horizon=False)
    y = rng.normal(size=(F.shape[1],))
    s0 = np.array([1.0, 0.5, -0.2])
    x = F @ y + G @ s0
    traj = jnp.asarray(np.stack([x, 2 * x, -x], axis=-1).reshape(1, -1, 3)
                       .reshape(M, n + 1, 3))
    st = bz.traj_state(traj, 0.0, dt)
    np.testing.assert_allclose(st["pos"][0], s0[0], atol=1e-9)
    np.testing.assert_allclose(st["vel"][0], s0[1], atol=1e-9)
    np.testing.assert_allclose(st["acc"][0], s0[2], atol=1e-8)
    # continuity at boundary m=1: approach from both sides
    # acc changes at jerk rate (~1e4 here), so the boundary eps must be tiny
    eps = 1e-9
    lo = bz.traj_state(traj, dt - eps, dt)
    hi = bz.traj_state(traj, dt + eps, dt)
    for k in ("pos", "vel", "acc"):
        np.testing.assert_allclose(lo[k], hi[k], atol=1e-4)


def test_q_base_vs_numerical_jerk_integral(rng):
    """c^T Q c == integral over the segment of ||jerk||^2 dt."""
    n, phi, dt = 5, 3, 0.2
    Q = bz.q_base(n, phi, 1, dt)
    c = rng.normal(size=(n + 1,))
    quad = float(c @ Q @ c)

    # numerical: jerk of p(tau(t)) with tau = t/dt, scale 1/dt^3
    ts = np.linspace(0, 1, 20001)
    jerk_c = np.asarray(bz.derivative_ctrl(bz.derivative_ctrl(
        bz.derivative_ctrl(jnp.asarray(c)[:, None], dt), dt), dt))[:, 0]
    vals = np.asarray(bz.bernstein_eval(jnp.asarray(jerk_c)[:, None],
                                        jnp.asarray(ts)))[:, 0]
    integral = np.trapezoid(vals ** 2, ts * dt)
    np.testing.assert_allclose(quad, integral, rtol=1e-6)


def test_q_base_matches_cplex_dump():
    """Cross-check Q against the shipped CPLEX model dump.

    CPLEX .lp halves the bracketed quadratic block, so with the benchmark
    preset (w_ci = 0.01, dt = 0.2):
      z_0_0^2 coefficient 45000  -> w_ci * Q[0,0]   = 22500
      z_0_0*z_0_1 coeff  -225000 -> 2 w_ci * Q[0,1] = -112500
    (source: /root/reference/log/QPmodel.lp, objective block.)
    """
    Q = bz.q_base(5, 3, 1, 0.2)
    np.testing.assert_allclose(0.01 * Q[0, 0], 45000.0 / 2, rtol=1e-9)
    np.testing.assert_allclose(2 * 0.01 * Q[0, 1], -225000.0 / 2, rtol=1e-9)


def test_bernstein_fitting_roundtrip(rng):
    ctrl = jnp.asarray(rng.normal(size=(6, 3)))
    ts = jnp.linspace(0, 1, 6)
    targets = jnp.stack([bz.bernstein_eval(ctrl, t) for t in ts])
    fitted = bz.bernstein_fitting(targets, ts)
    np.testing.assert_allclose(fitted, ctrl, atol=1e-8)


def test_subdivision(rng):
    """subdivide(c, a, b) restricts to q(t) = p(b + a t) (reference
    subdivisionBernsteinCurve convention, polynomial.hpp:430-455)."""
    ctrl = jnp.asarray(rng.normal(size=(6, 3)))
    a, b = 0.5, 0.3
    sub = bz.subdivide(ctrl, a, b)
    for t in (0.0, 0.4, 1.0):
        np.testing.assert_allclose(bz.bernstein_eval(sub, t),
                                   bz.bernstein_eval(ctrl, b + a * t),
                                   atol=1e-9)


def test_power_coeffs_matches_eval(rng):
    ctrl = jnp.asarray(rng.normal(size=(5, 6)))     # 5 scalar curves, n=5
    coef = bz.power_coeffs(ctrl)
    for t in (0.0, 0.17, 0.5, 0.93, 1.0):
        np.testing.assert_allclose(
            bz.poly_eval(coef, t),
            bz.bernstein_eval(ctrl[..., None], t)[..., 0], atol=1e-9)


def test_real_roots_known_polynomial():
    """(t - 0.3)(t - 0.7)(t + 1) ascending coefficients."""
    r1, r2, r3 = 0.3, 0.7, -1.0
    coef = jnp.asarray(np.poly(np.array([r1, r2, r3]))[::-1].copy())
    roots, mask = bz.real_roots(coef)
    found = np.sort(np.asarray(roots)[np.asarray(mask)])
    np.testing.assert_allclose(found, [0.3, 0.7], atol=1e-9)


def test_real_roots_grid_point_root():
    coef = jnp.asarray(np.poly(np.array([0.5]))[::-1].copy())  # t - 0.5
    roots, mask = bz.real_roots(coef, n_grid=64)
    found = np.asarray(roots)[np.asarray(mask)]
    assert len(found) == 1
    np.testing.assert_allclose(found, [0.5], atol=1e-9)


def test_curve_pair_min_distance_brute_force(rng):
    """Golden: dense 20001-point sampling of |a(t) - b(t)| (the reference
    computes the same minimum via root isolation + bisection,
    polynomial.hpp:310-413)."""
    ctrl_a = jnp.asarray(rng.normal(size=(8, 6, 3)) * 2.0)
    ctrl_b = jnp.asarray(rng.normal(size=(8, 6, 3)) * 2.0)
    dist, closest = bz.curve_pair_min_distance(ctrl_a, ctrl_b)
    ts = np.linspace(0, 1, 20001)
    rel = np.asarray(
        jax.vmap(lambda t: bz.bernstein_eval(ctrl_a - ctrl_b, t))(
            jnp.asarray(ts)))                     # (T, 8, 3)
    brute = np.linalg.norm(rel, axis=-1).min(axis=0)
    np.testing.assert_allclose(np.asarray(dist), brute, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(closest), axis=-1),
                               brute, atol=1e-6)


def test_curve_pair_min_distance_endpoint_case():
    """Monotonically separating curves: min at t=0 exactly."""
    a = jnp.asarray(np.linspace([0, 0, 0], [5, 0, 0], 6))
    b = jnp.asarray(np.linspace([0, 1, 0], [-5, 1, 0], 6))
    dist, _ = bz.curve_pair_min_distance(a, b)
    np.testing.assert_allclose(float(dist), 1.0, atol=1e-9)
