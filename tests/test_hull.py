"""Tests for the batched min-norm-point (hull closest point) kernel against
an exact Caratheodory enumeration oracle (replaces openGJK validation)."""
import itertools

import jax.numpy as jnp
import numpy as np

from lsc_planner_tpu.ops import hull


def exact_min_norm_point(P):
    """Exact closest point of conv(P) to origin by enumerating supports
    (Caratheodory: support size <= dim+1)."""
    K = P.shape[0]
    best = None
    best_d = np.inf
    for size in range(1, min(K, 4) + 1):
        for S in itertools.combinations(range(K), size):
            Ps = P[list(S)]
            G = Ps @ Ps.T
            A = np.zeros((size + 1, size + 1))
            A[:size, :size] = G
            A[:size, size] = 1
            A[size, :size] = 1
            rhs = np.zeros(size + 1)
            rhs[size] = 1
            try:
                sol = np.linalg.solve(A + 1e-14 * np.eye(size + 1), rhs)
            except np.linalg.LinAlgError:
                continue
            lam = sol[:size]
            if np.any(lam < -1e-10):
                continue
            pt = lam @ Ps
            d = np.linalg.norm(pt)
            if d < best_d:
                best_d, best = d, pt
    return best, best_d


def test_simplex_projection(rng):
    v = jnp.asarray(rng.normal(size=(100, 6)))
    p = np.asarray(hull.project_simplex(v))
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-9)
    assert (p >= -1e-12).all()
    # projection optimality: for random w in simplex, <v - p, w - p> <= 0
    w = rng.dirichlet(np.ones(6), size=100)
    inner = np.sum((np.asarray(v) - p) * (w - p), axis=-1)
    assert (inner <= 1e-8).all()


def test_closest_point_matches_exact_oracle(rng):
    pts = rng.normal(size=(50, 6, 3)) + np.array([1.5, 0.5, -0.5])
    closest, dist = hull.closest_point_to_hull(jnp.asarray(pts), iters=96)
    closest, dist = np.asarray(closest), np.asarray(dist)
    for b in range(pts.shape[0]):
        _, d_exact = exact_min_norm_point(pts[b])
        np.testing.assert_allclose(dist[b], d_exact, rtol=2e-5, atol=2e-6)


def test_normal_direction(rng):
    """Normal must separate the hull from the origin: n . p_i >= dist
    (only meaningful when the origin is outside the hull)."""
    pts = jnp.asarray(rng.normal(size=(200, 6, 3)) + np.array([2.0, 0, 0]))
    normal, dist = hull.hull_normal(pts)
    dist = np.asarray(dist)
    margin = np.einsum("bkd,bd->bk", np.asarray(pts), np.asarray(normal))
    outside = dist > 1e-6
    assert outside.sum() > 150
    assert (margin[outside] >= dist[outside, None] - 1e-5).all()


def test_origin_inside_hull(rng):
    """Symmetric point sets contain the origin: dist ~ 0, finite normal."""
    half = rng.normal(size=(20, 3, 3))
    pts = jnp.asarray(np.concatenate([half, -half], axis=1))
    normal, dist = hull.hull_normal(pts)
    assert np.asarray(dist).max() < 1e-3
    assert np.isfinite(np.asarray(normal)).all()


def test_float32_accuracy(rng):
    """Device-dtype path keeps ~1e-3 absolute accuracy."""
    pts64 = rng.normal(size=(50, 6, 3)) + np.array([1.0, -0.5, 0.25])
    _, d32 = hull.closest_point_to_hull(
        jnp.asarray(pts64, dtype=jnp.float32), iters=96)
    for b in range(50):
        _, d_exact = exact_min_norm_point(pts64[b])
        np.testing.assert_allclose(np.asarray(d32)[b], d_exact, atol=2e-3)


def test_f32_no_spurious_inside_far_clusters(rng):
    """Regression (round-2 1024-agent collisions): tightly-clustered
    relative control points ~10-15 m from the origin -- the parallel-
    trajectory LSC geometry -- must NOT trip the interior-point detector
    in float32.  A spurious 'inside' zeroes the normal and poisons the
    LSC planes by O(|p|)."""
    centers = rng.normal(size=(512, 1, 3))
    centers *= (4.0 + 12.0 * rng.random((512, 1, 1))) / \
        np.linalg.norm(centers, axis=-1, keepdims=True)
    pts = centers + 0.05 * rng.normal(size=(512, 6, 3))
    normal, dist = hull.hull_normal(jnp.asarray(pts, dtype=jnp.float32))
    dist = np.asarray(dist)
    cnorm = np.linalg.norm(centers[:, 0], axis=-1)
    # distance must be ~|center|, never zeroed by a fake interior verdict
    assert (dist > cnorm - 0.5).all()
    # and the supporting-plane property must hold: p_i . n >= dist - tol
    margin = np.einsum("bkd,bd->bk", pts, np.asarray(normal))
    assert (margin >= dist[:, None] - 1e-2).all()


def test_f32_true_interior_still_detected(rng):
    """Large symmetric hulls containing the origin must still be flagged
    interior in float32 (dist -> 0) despite the tolerance hardening."""
    half = rng.normal(size=(64, 3, 3)) * 10.0
    pts = np.concatenate([half, -half], axis=1)
    _, dist = hull.hull_normal(jnp.asarray(pts, dtype=jnp.float32))
    assert np.asarray(dist).max() < 2e-2
