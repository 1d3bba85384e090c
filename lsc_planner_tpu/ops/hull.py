"""Batched closest point between the origin and a small convex hull.

TPU-native replacement for the reference's openGJK kernel
(``src/openGJK/openGJK.cpp`` via ``closestPointsBetweenPointAndConvexHull``,
``include/geometry.hpp:364-394``), which the planner calls once per
(agent, obstacle, segment) triple to get LSC normal vectors
(``src/traj_planner.cpp:2030-2043`` normalVectorBetweenPolys).

Instead of a branchy sequential simplex walk, we exploit Caratheodory: in
R^3 the minimum-norm point of conv(P) has support <= 4, so for the K = n+1
(= 6) hull points we enumerate every subset of size 1..4, solve each
equality-constrained subproblem

    min || P_S^T lam ||^2   s.t.  1^T lam = 1        (bordered KKT system)

as one fully-parallel batched linear solve, keep the lam >= 0 feasible ones
(each is a point inside the hull, hence an upper bound; the true support is
among them, hence exactness), and take the minimum.  Zero sequential steps,
exact answer, thousands of instances per microsecond on the VPU/MXU.

A FISTA fallback (accelerated projected gradient on the simplex) covers
K > 8 where enumeration would blow up.
"""
from __future__ import annotations

import itertools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def project_simplex(v):
    """Euclidean projection of v (..., K) onto the probability simplex."""
    K = v.shape[-1]
    u = jnp.sort(v, axis=-1)[..., ::-1]
    css = jnp.cumsum(u, axis=-1)
    j = jnp.arange(1, K + 1, dtype=v.dtype)
    cond = u + (1.0 - css) / j > 0
    rho = jnp.sum(cond.astype(jnp.int32), axis=-1)
    css_rho = jnp.take_along_axis(css, (rho - 1)[..., None], axis=-1)[..., 0]
    tau = (css_rho - 1.0) / rho.astype(v.dtype)
    return jnp.maximum(v - tau[..., None], 0.0)


@lru_cache(maxsize=None)
def _subsets(K: int, k: int) -> np.ndarray:
    return np.asarray(list(itertools.combinations(range(K), k)),
                      dtype=np.int32)


def _solve_subsets(points, subs, feas_tol: float = 1e-7):
    """Solve the bordered min-norm systems for all subsets of one size.

    points: (..., K, 3); subs: (S, k) static indices.
    Returns (cand (..., S, 3), d2 (..., S), feasible (..., S)).

    The math is fully scalarized over the tiny k x k systems: every G
    entry, Cholesky element, and substitution step is an elementwise op on
    a FLAT (batch*S,) vector.  This keeps the VPU lanes fully occupied --
    matrix layouts of shape (..., k, k) with k <= 5 pad the 128-wide lane
    dimension ~30x, and the batched LU custom call is worse still (~40x
    memory blowup); both dominated the swarm-scale profile.
    """
    S, k = subs.shape
    K = points.shape[-2]
    batch_shape = points.shape[:-2]

    # per-(subset-slot, dim) flat component vectors, selected with static
    # 0/1 matrices: a (..., K) x (K, S) contraction instead of a gather
    # (TPU gathers at swarm-scale batch sizes dominated the LSC profile)
    comp = []                                        # comp[j][d]: (flat,)
    pts_d = [points[..., d] for d in range(3)]       # (..., K) each
    for j in range(k):
        sel = np.zeros((K, S), points.dtype)
        sel[subs[:, j], np.arange(S)] = 1.0
        sel = jnp.asarray(sel)
        comp.append([
            jnp.einsum("...k,ks->...s", pts_d[d], sel).reshape(-1)
            for d in range(3)])

    # Gram entries (upper triangle)
    G = [[None] * k for _ in range(k)]
    for i in range(k):
        for j in range(i, k):
            G[i][j] = sum(comp[i][d] * comp[j][d] for d in range(3))
            G[j][i] = G[i][j]
    # relative ridge keeps degenerate (affinely dependent) subsets finite;
    # they are then dominated by a non-degenerate subset.
    scale = sum(G[i][i] for i in range(k)) / k
    ridge = 1e-7 * scale + 1e-30
    for i in range(k):
        G[i][i] = G[i][i] + ridge

    # unrolled scalar Cholesky
    L = [[None] * k for _ in range(k)]
    for j in range(k):
        s_ = G[j][j]
        for p_ in range(j):
            s_ = s_ - L[j][p_] * L[j][p_]
        diag = jnp.sqrt(jnp.maximum(s_, 1e-30))
        L[j][j] = diag
        inv = 1.0 / diag
        for i in range(j + 1, k):
            s2 = G[i][j]
            for p_ in range(j):
                s2 = s2 - L[i][p_] * L[j][p_]
            L[i][j] = s2 * inv

    # solve G w = 1 (forward/backward substitution), lam = w / sum(w)
    y = [None] * k
    for i in range(k):
        s_ = jnp.ones_like(scale)
        for p_ in range(i):
            s_ = s_ - L[i][p_] * y[p_]
        y[i] = s_ / L[i][i]
    w = [None] * k
    for i in reversed(range(k)):
        s_ = y[i]
        for p_ in range(i + 1, k):
            s_ = s_ - L[p_][i] * w[p_]
        w[i] = s_ / L[i][i]
    denom = sum(w)
    lam = [w[i] / denom for i in range(k)]

    feasible = jnp.ones_like(scale, dtype=bool)
    for i in range(k):
        feasible = feasible & (lam[i] > -feas_tol) & jnp.isfinite(lam[i])
    lam = [jnp.clip(l, 0.0, None) for l in lam]
    lam_sum = jnp.maximum(sum(lam), 1e-12)
    lam = [l / lam_sum for l in lam]

    cand_d = [sum(lam[j] * comp[j][d] for j in range(k)) for d in range(3)]
    d2 = sum(c * c for c in cand_d)

    out_shape = batch_shape + (S,)
    cand = jnp.stack([c.reshape(out_shape) for c in cand_d], axis=-1)
    return cand, d2.reshape(out_shape), feasible.reshape(out_shape)


def closest_point_to_hull(points, iters: int = 0, max_support: int = 3):
    """Exact closest point of conv(points) to the origin, batched.

    points: (..., K, 3).  Returns (closest (..., 3), dist (...,)).
    `iters` is accepted for API compatibility; the enumeration path is
    exact and iteration-free for K <= 8 (K > 8 falls back to FISTA).
    """
    K = points.shape[-2]
    if K > 8:
        return _closest_point_fista(points, iters=max(iters, 256))
    with jax.default_matmul_precision("highest"):
        return _closest_point_enum(points, max_support)


def _closest_point_enum(points, max_support):
    K = points.shape[-2]
    cands, d2s, feas = [], [], []
    for k in range(1, min(K, max_support) + 1):
        subs = _subsets(K, k)          # static numpy indices
        c, d2, f = _solve_subsets(points, subs)
        cands.append(c)
        d2s.append(d2)
        feas.append(f)
    cand = jnp.concatenate(cands, axis=-2)           # (..., T, 3)
    d2 = jnp.concatenate(d2s, axis=-1)               # (..., T)
    feas = jnp.concatenate(feas, axis=-1)
    d2 = jnp.where(feas, d2, jnp.inf)
    # degenerate subsets can carry inf/NaN coordinates; the masked-sum
    # selection below multiplies EVERY candidate by its 0/1 weight, so
    # non-finite losers must be zeroed (0 * inf = NaN)
    cand = jnp.where(jnp.isfinite(cand), cand, 0.0)
    # argmin selection as a masked sum (first-minimum one-hot) rather
    # than take_along_axis: gathers at swarm-scale batches are slow on
    # TPU, elementwise select + reduce fuses for free
    d2_min = jnp.min(d2, axis=-1, keepdims=True)
    is_min = d2 <= d2_min
    first = jnp.cumsum(is_min.astype(d2.dtype), axis=-1) * \
        is_min.astype(d2.dtype)
    onehot = (first == 1.0).astype(cand.dtype)
    closest = jnp.einsum("...t,...td->...d", onehot, cand)
    d2_best = d2_min[..., 0]

    if K > max_support >= 3:
        # Caratheodory sharpened: in R^3 the projection of the origin
        # onto conv(P) lies on a face of dimension <= 2, so support
        # size <= 3 EXCEPT when the origin is inside the hull (distance
        # 0, witnessed only by a 4-point simplex).  Instead of the 15
        # size-4 subsets (~half the enumeration work), detect the
        # interior case by the projection optimality condition:
        # c is the true projection  iff  (p_i - c) . c >= 0  for all i.
        #
        # NUMERICS: the test must be evaluated in this residual form.
        # The algebraically equal  min_i c.p_i < c.c  subtracts two
        # O(|p|^2) numbers whose f32 rounding noise (~1e-6 |p|^2) dwarfs
        # any fixed tolerance once points sit ~10 m out -- exactly the
        # parallel-trajectory LSC case where all relative control points
        # nearly coincide.  A spurious "inside" here zeroes the normal
        # and poisons the LSC planes by O(|p|) (the round-2 1024-agent
        # collision regression).  Forming q_i = p_i - c FIRST keeps the
        # product |q||c| small near the support set, so noise scales
        # with the true residual instead of with |p|^2.
        # Tolerances measured against the solver's own optimality-residual
        # noise floor on truly-outside instances across scales 1-150 m
        # (f32: -5.7e-5 * pscale, f64: -1e-9 * pscale, dominated by the
        # 1e-7 relative ridge in _solve_subsets); true interior verdicts
        # carry gaps of order d2_best/pscale, far above either threshold,
        # and shallow-interior cases already resolve to ~zero distance
        # through face candidates without needing this flag.
        q = points - closest[..., None, :]
        qc_min = jnp.min(jnp.einsum("...kd,...d->...k", q, closest),
                         axis=-1)
        pscale = jnp.max(jnp.sum(points * points, axis=-1), axis=-1)
        tol = 3e-4 if points.dtype == jnp.float32 else 1e-6
        inside = qc_min < -tol * pscale
        closest = jnp.where(inside[..., None], 0.0, closest)
        d2_best = jnp.where(inside, 0.0, d2_best)

    dist = jnp.sqrt(d2_best)
    return closest, dist


def _closest_point_fista(points, iters: int = 256):
    """Accelerated projected-gradient fallback for larger K."""
    G = jnp.einsum("...id,...jd->...ij", points, points)
    K = G.shape[-1]
    L = 2.0 * jnp.sqrt(jnp.sum(G * G, axis=(-2, -1)) + 1e-30)
    step = (1.0 / L)[..., None]
    lam0 = jnp.full(G.shape[:-1], 1.0 / K, dtype=G.dtype)

    def body(carry, _):
        lam, y, t = carry
        grad = 2.0 * jnp.einsum("...ij,...j->...i", G, y)
        lam_new = project_simplex(y - step * grad)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = lam_new + ((t - 1.0) / t_new) * (lam_new - lam)
        return (lam_new, y_new, t_new), None

    (lam, _, _), _ = jax.lax.scan(
        body, (lam0, lam0, jnp.ones((), G.dtype)), None, length=iters)
    closest = jnp.einsum("...i,...id->...d", lam, points)
    return closest, jnp.linalg.norm(closest, axis=-1)


def hull_normal(points, iters: int = 0, eps: float = 1e-10):
    """Unit vector from the origin toward the hull's closest point.

    This is the LSC normal when `points` are the relative control points
    agent - obstacle (traj_planner.cpp:2030-2043).  Degenerate (origin
    inside hull) falls back to +x like the reference's zero-norm heuristic.
    """
    closest, dist = closest_point_to_hull(points, iters=iters)
    safe = dist[..., None] > eps
    fallback = jnp.zeros_like(closest).at[..., 0].set(1.0)
    normal = jnp.where(safe, closest / jnp.maximum(dist[..., None], eps),
                       fallback)
    return normal, dist
