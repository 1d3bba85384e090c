"""Batched closest-point geometry (reference ``include/geometry.hpp``).

Every primitive is a pure elementwise/vmap-able function of fixed-shape
inputs; no branching on traced data (selects via jnp.where), so everything
stays inside a single XLA program.
"""
from __future__ import annotations

import jax.numpy as jnp

from .hull import closest_point_to_hull, hull_normal  # re-export


def closest_point_on_segment(point, a, b, eps=1e-12):
    """Closest point on segment [a, b] to `point`; all (..., 3).

    Returns (closest (..., 3), dist (...,)).  Mirrors
    closestPointsBetweenPointAndLineSegment (geometry.hpp:57-93).
    """
    ab = b - a
    denom = jnp.sum(ab * ab, axis=-1, keepdims=True)
    t = jnp.sum((point - a) * ab, axis=-1, keepdims=True) / jnp.maximum(
        denom, eps)
    t = jnp.clip(t, 0.0, 1.0)
    closest = a + t * ab
    dist = jnp.linalg.norm(point - closest, axis=-1)
    return closest, dist


def closest_between_linear_paths(p1_start, p1_goal, p2_start, p2_goal,
                                 eps=1e-12):
    """Minimum over alpha in [0,1] of ||(p1(a) - p2(a))||, i.e. the two
    points move simultaneously along their segments (reference
    closestPointsBetweenLinePaths, geometry.hpp:96-121).

    Returns (closest1, closest2, dist).
    """
    rel_start = p2_start - p1_start
    rel_goal = p2_goal - p1_goal
    origin = jnp.zeros_like(rel_start)
    rel_closest, dist = closest_point_on_segment(origin, rel_start, rel_goal,
                                                 eps)
    seg = rel_goal - rel_start
    seg_len = jnp.linalg.norm(seg, axis=-1, keepdims=True)
    alpha = jnp.where(seg_len > eps,
                      jnp.linalg.norm(rel_closest - rel_start, axis=-1,
                                      keepdims=True) / jnp.maximum(seg_len,
                                                                   eps),
                      jnp.zeros_like(seg_len))
    closest1 = p1_start + (p1_goal - p1_start) * alpha
    closest2 = p2_start + (p2_goal - p2_start) * alpha
    return closest1, closest2, dist


def normal_vector_between_paths(obs_start, obs_goal, agent_start, agent_goal,
                                eps=1e-10):
    """LSC normal for linear predictions (TrajPlanner::normalVector,
    traj_planner.cpp:1869-1892) with its zero-distance heuristic.

    Returns (normal (..., 3), closest_dist (...,)).
    """
    c1, c2, dist = closest_between_linear_paths(obs_start, obs_goal,
                                                agent_start, agent_goal)
    delta = c2 - c1
    nrm = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    normal = delta / jnp.maximum(nrm, eps)
    # heuristic when the paths touch: n = (b - a) x z_hat
    a = agent_start - obs_start
    b = agent_goal - obs_goal
    z_hat = jnp.zeros_like(a).at[..., 2].set(1.0)
    alt = jnp.cross(b - a, z_hat)
    alt_n = jnp.linalg.norm(alt, axis=-1, keepdims=True)
    x_hat = jnp.zeros_like(a).at[..., 0].set(1.0)
    alt = jnp.where(alt_n > eps, alt / jnp.maximum(alt_n, eps), x_hat)
    normal = jnp.where(nrm > eps, normal, alt)
    return normal, dist


def ellipsoidal_distance(p1, p2, downwash):
    """Downwash-aware inter-agent distance: z compressed by 1/downwash
    (reference util.hpp:225-229 distBetweenAgents via coordinate transform
    util.hpp:231-240)."""
    delta = p1 - p2
    dz = delta[..., 2] / downwash
    return jnp.sqrt(delta[..., 0] ** 2 + delta[..., 1] ** 2 + dz ** 2)


def downwash_transform(points, downwash):
    """Scale z by 1/downwash: the coordinate transform applied to control
    points before LSC normal computation (util.hpp:231-240,
    traj_planner.cpp:1347-1349).  points (..., 3), downwash broadcastable."""
    scale = jnp.stack([jnp.ones_like(downwash), jnp.ones_like(downwash),
                       1.0 / downwash], axis=-1)
    return points * scale


def pair_downwash(radius_i, downwash_i, radius_j, downwash_j):
    """Combined downwash coefficient for an agent pair
    (traj_planner.cpp:1339-1345)."""
    return ((downwash_i * radius_i + downwash_j * radius_j)
            / (radius_i + radius_j))


def point_box_distance(point, box_min, box_max):
    """Distance from point to an axis-aligned box (0 inside)."""
    d = jnp.maximum(box_min - point, 0.0) + jnp.maximum(point - box_max, 0.0)
    return jnp.linalg.norm(d, axis=-1)


def collision_time_linear(obs_start, obs_goal, agent_start, agent_goal,
                          collision_dist, horizon, eps=1e-12):
    """First time in [0, horizon] when two linearly-moving points get closer
    than collision_dist; +inf if never (reference computeCollisionTime,
    geometry.hpp:553-642, linear-path case).

    Relative motion r(t) = r0 + (t/T)(r1 - r0); solve ||r(t)|| = R.
    """
    r0 = agent_start - obs_start
    r1 = agent_goal - obs_goal
    d = r1 - r0
    a = jnp.sum(d * d, axis=-1)
    b = 2.0 * jnp.sum(r0 * d, axis=-1)
    c = jnp.sum(r0 * r0, axis=-1) - collision_dist ** 2
    inf = jnp.full_like(a, jnp.inf)
    # already colliding at t=0
    t_hit0 = jnp.where(c <= 0, 0.0, jnp.inf)
    disc = b * b - 4 * a * c
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    s1 = (-b - sqrt_disc) / jnp.maximum(2 * a, eps)
    valid = (disc >= 0) & (a > eps) & (s1 >= 0.0) & (s1 <= 1.0)
    t_hit = jnp.where(valid, s1 * horizon, inf)
    return jnp.minimum(t_hit0, t_hit)
