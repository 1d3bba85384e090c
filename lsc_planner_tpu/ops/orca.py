"""Batched 3-D ORCA (reciprocal collision avoidance).

Re-implements the capability of the vendored, modified RVO2-3D library
(src/RVO2-3D/Agent.cpp:119-195 plane construction, :228-445 linear
programs lp1-lp4, including the planner's customizations: non-reciprocal
dynamic obstacles take the full avoidance vector u instead of 0.5u,
RVOSimulator.h:314-320) as fixed-shape JAX programs batched over agents.

The sequential incremental LPs translate directly: every data-dependent
branch becomes a select, loops run over the static neighbour bound with
validity masks, and the whole swarm solves in parallel.  2-D worlds reuse
the 3-D solver with two planes pinning v_z = 0 (mathematically the 2-D LP
on that slice), instead of a separate RVO2-2D code path.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

RVO_EPSILON = 1e-5


class OrcaPlanes(NamedTuple):
    normal: jnp.ndarray   # (..., O, 3)
    point: jnp.ndarray    # (..., O, 3)
    valid: jnp.ndarray    # (..., O) bool


def _norm(v, eps=1e-12):
    return jnp.sqrt(jnp.sum(v * v, axis=-1))


def build_orca_planes(pos, vel, radius, obs_pos, obs_vel, obs_radius,
                      obs_is_dynamic, obs_mask, time_horizon, time_step):
    """ORCA planes of one agent block vs its neighbours
    (Agent::computeNewVelocity, RVO2-3D/Agent.cpp:119-195).

    pos/vel: (N, 3); radius: (N,); obs_*: (N, O, ...) per-agent neighbour
    views; obs_mask: (N, O) valid-neighbour mask.
    """
    rel_pos = obs_pos - pos[..., None, :]
    rel_vel = vel[..., None, :] - obs_vel
    dist_sq = jnp.sum(rel_pos * rel_pos, axis=-1)
    comb_r = radius[..., None] + obs_radius
    comb_r_sq = comb_r ** 2
    inv_th = 1.0 / time_horizon
    inv_ts = 1.0 / time_step

    # --- no-collision case ---
    w = rel_vel - inv_th * rel_pos
    w_len_sq = jnp.sum(w * w, axis=-1)
    dot1 = jnp.sum(w * rel_pos, axis=-1)
    proj_cutoff = (dot1 < 0.0) & (dot1 ** 2 > comb_r_sq * w_len_sq)

    w_len = jnp.sqrt(jnp.maximum(w_len_sq, 1e-20))
    unit_w = w / w_len[..., None]
    n_cut = unit_w
    u_cut = (comb_r * inv_th - w_len)[..., None] * unit_w

    # cone projection
    a = dist_sq
    b = jnp.sum(rel_pos * rel_vel, axis=-1)
    cr = jnp.cross(rel_pos, rel_vel)
    denom = jnp.where(jnp.abs(dist_sq - comb_r_sq) > 1e-12,
                      dist_sq - comb_r_sq, 1e-12)
    c = jnp.sum(rel_vel * rel_vel, axis=-1) - \
        jnp.sum(cr * cr, axis=-1) / denom
    disc = jnp.maximum(b * b - a * c, 0.0)
    t = (b + jnp.sqrt(disc)) / jnp.maximum(a, 1e-12)
    w_cone = rel_vel - t[..., None] * rel_pos
    wc_len = jnp.maximum(_norm(w_cone), 1e-12)
    unit_wc = w_cone / wc_len[..., None]
    n_cone = unit_wc
    u_cone = (comb_r * t - wc_len)[..., None] * unit_wc

    n_nc = jnp.where(proj_cutoff[..., None], n_cut, n_cone)
    u_nc = jnp.where(proj_cutoff[..., None], u_cut, u_cone)

    # --- collision case ---
    w_col = rel_vel - inv_ts * rel_pos
    wl_col = jnp.maximum(_norm(w_col), 1e-12)
    unit_col = w_col / wl_col[..., None]
    n_col = unit_col
    u_col = (comb_r * inv_ts - wl_col)[..., None] * unit_col

    collision = dist_sq <= comb_r_sq
    normal = jnp.where(collision[..., None], n_col, n_nc)
    u = jnp.where(collision[..., None], u_col, u_nc)

    # responsibility share: half for reciprocal agents, full for
    # non-reciprocal dynamic obstacles (the planner's RVO2 modification)
    share = jnp.where(obs_is_dynamic, 1.0, 0.5)
    point = vel[..., None, :] + share[..., None] * u
    return OrcaPlanes(normal=normal, point=point, valid=obs_mask)


# ---------------------------------------------------------------------------
# linear programs (Agent.cpp:228-445), fixed-shape with masks
# ---------------------------------------------------------------------------

def _lp1(planes: OrcaPlanes, upto, line_pt, line_dir, radius, opt_vel,
         direction_opt):
    """Clip a line against the sphere and planes[:upto]; optimize along it.
    Returns (ok, result)."""
    dot = jnp.sum(line_pt * line_dir, axis=-1)
    disc = dot ** 2 + radius ** 2 - jnp.sum(line_pt * line_pt, axis=-1)
    ok0 = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_left0, t_right0 = -dot - sq, -dot + sq

    O = planes.valid.shape[-1]

    def body(i, st):
        t_left, t_right, ok = st
        active = (i < upto) & planes.valid[..., i] & ok
        num = jnp.sum((planes.point[..., i, :] - line_pt) *
                      planes.normal[..., i, :], axis=-1)
        den = jnp.sum(line_dir * planes.normal[..., i, :], axis=-1)
        parallel = den ** 2 <= RVO_EPSILON
        fail_par = parallel & (num > 0.0)
        t = num / jnp.where(parallel, 1.0, den)
        t_left_n = jnp.where(den >= 0.0, jnp.maximum(t_left, t), t_left)
        t_right_n = jnp.where(den >= 0.0, t_right, jnp.minimum(t_right, t))
        t_left_n = jnp.where(parallel, t_left, t_left_n)
        t_right_n = jnp.where(parallel, t_right, t_right_n)
        fail = fail_par | (t_left_n > t_right_n)
        ok_n = ok & ~(active & fail)
        upd = active & ~fail
        return (jnp.where(upd, t_left_n, t_left),
                jnp.where(upd, t_right_n, t_right), ok_n)

    t_left, t_right, ok = jax.lax.fori_loop(
        0, O, body, (t_left0, t_right0, ok0))

    t_dir = jnp.where(jnp.sum(opt_vel * line_dir, axis=-1) > 0.0,
                      t_right, t_left)
    t_pt = jnp.clip(jnp.sum(line_dir * (opt_vel - line_pt), axis=-1),
                    t_left, t_right)
    t_star = jnp.where(direction_opt, t_dir, t_pt)
    result = line_pt + t_star[..., None] * line_dir
    return ok, result


def _lp2(planes: OrcaPlanes, plane_no, radius, opt_vel, direction_opt):
    """Optimize on plane `plane_no` inside the sphere, honouring
    planes[:plane_no].  Returns (ok, result)."""
    n_p = jnp.take_along_axis(
        planes.normal, plane_no[..., None, None].repeat(3, -1), axis=-2
    )[..., 0, :]
    p_p = jnp.take_along_axis(
        planes.point, plane_no[..., None, None].repeat(3, -1), axis=-2
    )[..., 0, :]

    plane_dist = jnp.sum(p_p * n_p, axis=-1)
    ok0 = plane_dist ** 2 <= radius ** 2
    plane_r_sq = jnp.maximum(radius ** 2 - plane_dist ** 2, 0.0)
    plane_center = plane_dist[..., None] * n_p

    # direction optimization: project direction onto the plane
    pov = opt_vel - jnp.sum(opt_vel * n_p, axis=-1, keepdims=True) * n_p
    pov_sq = jnp.sum(pov * pov, axis=-1)
    res_dir = jnp.where(
        (pov_sq <= RVO_EPSILON)[..., None], plane_center,
        plane_center + jnp.sqrt(plane_r_sq /
                                jnp.maximum(pov_sq, 1e-20))[..., None] * pov)

    # point optimization: project point onto the plane, then the disc
    res_pt = opt_vel + jnp.sum((p_p - opt_vel) * n_p, axis=-1,
                               keepdims=True) * n_p
    out = jnp.sum(res_pt * res_pt, axis=-1) > radius ** 2
    pr = res_pt - plane_center
    pr_sq = jnp.maximum(jnp.sum(pr * pr, axis=-1), 1e-20)
    res_pt_c = plane_center + jnp.sqrt(plane_r_sq / pr_sq)[..., None] * pr
    res_pt = jnp.where(out[..., None], res_pt_c, res_pt)

    result0 = jnp.where(direction_opt, res_dir, res_pt)

    O = planes.valid.shape[-1]

    def body(i, st):
        result, ok = st
        active = (i < plane_no) & planes.valid[..., i] & ok
        n_i = planes.normal[..., i, :]
        p_i = planes.point[..., i, :]
        violated = jnp.sum(n_i * (p_i - result), axis=-1) > 0.0
        run = active & violated

        crossp = jnp.cross(n_i, n_p)
        cross_sq = jnp.sum(crossp * crossp, axis=-1)
        degen = cross_sq <= RVO_EPSILON
        line_dir = crossp / jnp.sqrt(jnp.maximum(cross_sq, 1e-20))[..., None]
        line_n = jnp.cross(line_dir, n_p)
        denom = jnp.sum(line_n * n_i, axis=-1)
        coef = (jnp.sum((p_i - p_p) * n_i, axis=-1) /
                jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20))
        line_pt = p_p + coef[..., None] * line_n

        ok1, res1 = _lp1(planes, i, line_pt, line_dir, radius, opt_vel,
                         direction_opt)
        fail = degen | ~ok1
        result = jnp.where((run & ~fail)[..., None], res1, result)
        ok = ok & ~(run & fail)
        return (result, ok)

    result, ok = jax.lax.fori_loop(0, O, body, (result0, ok0))
    return ok, result


def _lp3(planes: OrcaPlanes, radius, opt_vel, direction_opt):
    """Incremental LP over all planes.  Returns (fail_plane, result) with
    fail_plane == O when fully feasible."""
    O = planes.valid.shape[-1]
    norm_ov = jnp.sqrt(jnp.maximum(jnp.sum(opt_vel * opt_vel, axis=-1),
                                   1e-20))
    res_dir = opt_vel * radius[..., None]
    res_out = opt_vel / norm_ov[..., None] * radius[..., None]
    inside = jnp.sum(opt_vel * opt_vel, axis=-1) <= radius ** 2
    res_pt = jnp.where(inside[..., None], opt_vel, res_out)
    result0 = jnp.where(direction_opt, res_dir, res_pt)

    fail0 = jnp.full(radius.shape, O, dtype=jnp.int32)

    def body(i, st):
        result, fail = st
        not_failed = fail == O
        valid = planes.valid[..., i] & not_failed
        n_i = planes.normal[..., i, :]
        p_i = planes.point[..., i, :]
        violated = jnp.sum(n_i * (p_i - result), axis=-1) > 0.0
        run = valid & violated
        i_arr = jnp.full(fail.shape, i, dtype=jnp.int32)
        ok2, res2 = _lp2(planes, i_arr, radius, opt_vel, direction_opt)
        result = jnp.where((run & ok2)[..., None], res2, result)
        fail = jnp.where(run & ~ok2, i_arr, fail)
        return (result, fail)

    result, fail = jax.lax.fori_loop(0, O, body, (result0, fail0))
    return fail, result


def _lp4(planes: OrcaPlanes, begin_plane, radius, result):
    """Penetration-minimizing fallback when lp3 fails
    (Agent.cpp:396-444)."""
    O = planes.valid.shape[-1]

    def body(i, st):
        result, distance = st
        n_i = planes.normal[..., i, :]
        p_i = planes.point[..., i, :]
        active = (i >= begin_plane) & planes.valid[..., i]
        viol = jnp.sum(n_i * (p_i - result), axis=-1)
        run = active & (viol > distance)

        # projected planes j < i
        n_j = planes.normal                               # (..., O, 3)
        p_j = planes.point
        crossp = jnp.cross(n_j, n_i[..., None, :])
        cross_sq = jnp.sum(crossp * crossp, axis=-1)
        degen = cross_sq <= RVO_EPSILON
        same_dir = jnp.sum(n_j * n_i[..., None, :], axis=-1) > 0.0
        pp_degen = 0.5 * (p_i[..., None, :] + p_j)
        line_n = jnp.cross(crossp, n_i[..., None, :])
        denom = jnp.sum(line_n * n_j, axis=-1)
        coef = (jnp.sum((p_j - p_i[..., None, :]) * n_j, axis=-1) /
                jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20))
        pp_reg = p_i[..., None, :] + coef[..., None] * line_n
        proj_pt = jnp.where(degen[..., None], pp_degen, pp_reg)
        pn = n_j - n_i[..., None, :]
        pn = pn / jnp.sqrt(jnp.maximum(jnp.sum(pn * pn, axis=-1),
                                       1e-20))[..., None]
        j_idx = jnp.arange(O)
        proj_valid = (planes.valid & (j_idx < i) &
                      ~(degen & same_dir))
        proj = OrcaPlanes(normal=pn, point=proj_pt, valid=proj_valid)

        fail_j, res4 = _lp3(proj, radius, n_i, jnp.asarray(True))
        lp3_ok = fail_j >= O
        result_n = jnp.where((run & lp3_ok)[..., None], res4, result)
        dist_n = jnp.where(
            run, jnp.sum(n_i * (p_i - result_n), axis=-1), distance)
        return (result_n, dist_n)

    result, _ = jax.lax.fori_loop(
        0, O, body, (result, jnp.zeros(radius.shape, result.dtype)))
    return result


def solve_orca(planes: OrcaPlanes, max_speed, pref_vel):
    """newVelocity = argmin ||v - pref|| s.t. ORCA planes, |v| <= max_speed,
    with the lp4 penetration fallback."""
    fail, result = _lp3(planes, max_speed, pref_vel, jnp.asarray(False))
    O = planes.valid.shape[-1]
    need4 = fail < O
    result4 = _lp4(planes, fail, max_speed, result)
    return jnp.where(need4[..., None], result4, result)


def orca_velocities(pos, vel, radius, pref_vel, max_speed,
                    is_dynamic, time_horizon, time_step,
                    neighbor_dist=15.0, max_neighbors=10,
                    force_z_zero=False):
    """All-agents ORCA velocities (updateORCAVelocity3D analog,
    traj_planner.cpp:1149-1223): every agent avoids every other, with the
    kd-tree neighbour selection approximated by the max_neighbors nearest
    within neighbor_dist.

    pos/vel/pref_vel: (N, 3); radius (already inflation-scaled): (N,);
    max_speed: (N,); is_dynamic: (N,) bool (non-reciprocal obstacles).
    """
    N = pos.shape[0]
    d2 = jnp.sum((pos[None, :] - pos[:, None]) ** 2, axis=-1)
    d2 = jnp.where(jnp.eye(N, dtype=bool), jnp.inf, d2)
    K = min(max_neighbors, N - 1) if N > 1 else 1
    _, nbr = jax.lax.top_k(-d2, K)                       # (N, K)
    nbr_d2 = jnp.take_along_axis(d2, nbr, axis=1)
    mask = nbr_d2 < neighbor_dist ** 2

    planes = build_orca_planes(
        pos, vel, radius,
        obs_pos=pos[nbr], obs_vel=vel[nbr], obs_radius=radius[nbr],
        obs_is_dynamic=is_dynamic[nbr], obs_mask=mask,
        time_horizon=time_horizon, time_step=time_step)
    if force_z_zero:
        # 2-D worlds: two extra planes pin v_z to 0
        zplus = jnp.zeros((N, 1, 3)).at[..., 2].set(1.0)
        planes = OrcaPlanes(
            normal=jnp.concatenate([planes.normal, zplus, -zplus], axis=1),
            point=jnp.concatenate(
                [planes.point, jnp.zeros((N, 2, 3))], axis=1),
            valid=jnp.concatenate(
                [planes.valid, jnp.ones((N, 2), bool)], axis=1))
    return solve_orca(planes, max_speed, pref_vel)
