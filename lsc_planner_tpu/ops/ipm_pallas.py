"""Fully fused Pallas IPM: the whole Mehrotra predictor-corrector solve
(all iterations) in ONE kernel launch, batch-in-lanes, VMEM-resident.

The XLA formulation of the factored-row IPM (ops/qp.py solve_qp_lsc)
streams the (N, nr~1554) slack/dual/bound vectors and the (N, 39, 39) KKT
matrices through HBM a dozen times per iteration -- ~0.95 ms/iteration at
1024 agents, ~65% of the whole planning cycle.  Here one pallas_call per
128-agent lane tile keeps every iterate (y, s, lam), every row tensor
(normals, scales, bounds), and the KKT factor in VMEM across ALL
iterations; the only HBM traffic is one read of the problem and one write
of the solution.  All arithmetic is exact f32 VPU/MXU ops (better than
XLA's bf16x6 'highest' emulation of f32 matmuls).

Row structure (see planner/optimizer.py):
 * static rows (world bounds / vel / acc): +- pairs sharing a row vector
   that lives in ONE dimension block -- U (ndim, Ru, nf) unique rows;
   duals/slacks kept as separate +/- buffers; their Gram is
   sum_u d_u u u^T = UU @ d with the STATIC (nf^2, Ru) table UU.
 * plane rows (LSC/SFC): a_{c,m,i} = scale_{c,m,i} * n_{c,m} (x) F[m,i];
   their Gram contracts through the STATIC (M(n+1), nf^2) table FF.

Reference analog: TrajOptimizer::solve / CPLEX dual simplex
(src/traj_optimizer.cpp:31-154), one 10-thread QP at a time.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# LSC_IPM_DEBUG=1: per-iteration exit-signal trace (interpret mode only
# -- the TPU backend does not support debug callbacks)
_IPM_DEBUG = bool(os.environ.get("LSC_IPM_DEBUG"))


def _rowmin(x):
    """Min over all leading axes, keeping the lane axis: (..., B) -> (B,)."""
    return jnp.min(x.reshape(-1, x.shape[-1]), axis=0)


def _rowsum(x):
    return jnp.sum(x.reshape(-1, x.shape[-1]), axis=0)


def _rowmax(x):
    return jnp.max(x.reshape(-1, x.shape[-1]), axis=0)


def _step_len(v, dv, tau=0.995):
    """Largest alpha in (0,1] with v + alpha dv >= (1-tau) v, per lane.
    v/dv: lists of (..., B) buffers."""
    alpha = None
    for vi, dvi in zip(v, dv):
        ratio = jnp.where(dvi < 0.0, -vi / jnp.where(dvi < 0.0, dvi, -1.0),
                          jnp.inf)
        m = _rowmin(ratio)
        alpha = m if alpha is None else jnp.minimum(alpha, m)
    return jnp.minimum(1.0, tau * alpha)


def _chol_into(l_ref, H, n):
    """Lower Cholesky of H (n, n, B): columns written into the VMEM
    scratch l_ref (building L as a value via per-step jnp.where costs a
    full (n, n, B) pass per column -- as much as the Schur updates
    themselves).

    Modified-Cholesky pivot floor: the input is Jacobi-scaled to a unit
    diagonal, so exact pivots live in (0, 1]; f32 rounding near the
    interior-point endgame (mu < 1e-4 with tolerances disabled) can push
    a trailing pivot non-positive, and a bare rsqrt then NaNs the whole
    lane -- which the iteration's NaN guard converts into a PERMANENT
    freeze at whatever iterate the lane had.  Flooring the pivot at 1e-6
    (a +1e-6 diagonal perturbation at that elimination step, far below
    solution accuracy) keeps the factor finite so a knife-edge iteration
    degrades into a slightly-damped step instead of a dead lane."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    A = H
    for k in range(n):
        dk = jnp.maximum(A[k, k][None, :], 1e-6)
        inv = jax.lax.rsqrt(dk)
        col = A[:, k, :] * inv
        col = jnp.where(ri >= k, col, 0.0)
        l_ref[:, k, :] = col
        A = A - col[:, None, :] * col[None, :, :]


def _solve_lanes(l_ref, rhs, n):
    """(L L^T) x = rhs with the factor in scratch l_ref; rhs (n, B)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    z = rhs
    for k in range(n):
        zk = z[k] / l_ref[k, k]
        upd = z - l_ref[:, k, :] * zk[None, :]
        z = jnp.where(ri == k, zk[None, :], jnp.where(ri > k, upd, z))
    x = z
    for k in range(n - 1, -1, -1):
        xk = x[k] / l_ref[k, k]
        upd = x - l_ref[k, :, :] * xk[None, :]
        x = jnp.where(ri == k, xk[None, :], jnp.where(ri < k, upd, x))
    return x


def _mm(a, b):
    """2-D (r, k) @ (k, B) -> (r, B), exact f32.

    precision=HIGHEST is load-bearing: Mosaic's DEFAULT lowering of an
    f32 dot_general on the TPU MXU uses bf16 passes (measured max error
    6.2e2 on ~1.9e5-magnitude products vs 1.8e-2 at HIGHEST -- the
    kernel was NOT "exact f32" on hardware without it, interpret-mode
    tests never see the difference, and the bf16 noise floor in the
    dual residual kept the early exit from ever firing on TPU)."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _ipm_kernel(Pb_ref, q_ref, y0_ref, U_ref, UU_ref, bs_ref, nsc_ref,
                scale_ref, bpl_ref, Fseg_ref, FF_ref, valid_ref, sig_ref,
                y_ref, lam_s_ref, lam_p_ref, gap_ref, l_scr,
                *, iters: int, ndim: int, nf: int, Ru: int, C: int,
                M: int, n1: int, reg: float, s_min: float,
                tol_gap: float, tol_rp: float, tol_rd: float,
                tol_step: float, correctors: int):
    """One lane tile (B agents in lanes) of the full IPM solve.

    Tile shapes (B = lanes).  All plane-row buffers are FLAT 2-D
    (C*M*n1, B): higher-rank layouts decompose every elementwise pass
    into per-leading-index micro-ops with 25% sublane padding, which
    dominated the first version of this kernel.
      Pb    (nf, nf, B)          shared per-dim cost block
      q, y0 (ndim*nf, B)
      U     (ndim, Ru, nf)       unique static +rows (pre-scaled), shared
      UU    (ndim, nf*nf, Ru)    static-row Gram table, shared
      bs    (2, ndim*Ru, B)      static bounds, [0]=+rows, [1]=-rows
      nsc   (ndim, C*M*n1, B)    plane normals, pre-expanded over i
      scale (C*M*n1, B)          plane row scales (0 = masked)
      bpl   (C*M*n1, B)          plane bounds (-1 = masked)
      Fseg  (M*n1, nf)           segment basis rows, shared
      FF    (M*n1, nf*nf)        plane Gram table, shared
    Outputs: y (ndim*nf, B); lam_s (2, ndim*Ru, B); lam_p (C*M*n1, B);
      gap (1, B).
    """
    nv = ndim * nf
    MI = M * n1
    R = C * MI

    Pb = Pb_ref[:]
    q = q_ref[:]
    U = U_ref[:]
    UU = UU_ref[:]
    bs = bs_ref[:]
    nsc = nsc_ref[:]          # (ndim, R, B)
    scale = scale_ref[:]      # (R, B)
    bpl = bpl_ref[:]
    Fseg = Fseg_ref[:]
    FF = FF_ref[:]
    valid = valid_ref[0]          # (B,) 1.0 = real agent, 0.0 = pad lane
    sig = sig_ref[0]              # (B,) objective scale for tolerances
    B = q.shape[-1]

    # scale folded into the normals once: plane row values become plain
    # 2-D FMAs against the tiled x
    nscs = [nsc[k] * scale for k in range(ndim)]          # (R, B) each

    def tile_c(x):
        """(MI, B) -> (C*MI, B) by repeating over the obstacle axis."""
        return jnp.broadcast_to(x.reshape(1, MI, B),
                                (C, MI, B)).reshape(R, B)

    def red_c(x):
        """(C*MI, B) -> (MI, B): sum over the obstacle axis.  The input
        stays 2-D until this one splitting reshape (Mosaic rejects 1-D
        intermediates, so reduce the (C, MI, B) view directly)."""
        return jnp.sum(x.reshape(C, MI, B), axis=0)

    def mv(y):
        """A y -> (su (ndim*Ru, B) +row values, pl (R, B))."""
        y3 = y.reshape(ndim, nf, B)
        su = jnp.concatenate([_mm(U[k], y3[k]) for k in range(ndim)],
                             axis=0)
        pl = None
        for k in range(ndim):
            xk = tile_c(_mm(Fseg, y3[k]))                # (R, B)
            term = nscs[k] * xk
            pl = term if pl is None else pl + term
        return su, pl

    def rmv(w_su, w_pl):
        """A^T w; w_su = combined (+duals - -duals) of static rows."""
        w3 = w_su.reshape(ndim, Ru, B)
        parts = []
        for k in range(ndim):
            r_st = jax.lax.dot_general(
                U[k], w3[k], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)     # (nf, B)
            vk = red_c(nscs[k] * w_pl)                   # (MI, B)
            r_pl = jax.lax.dot_general(
                Fseg, vk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)     # (nf, B)
            parts.append(r_st + r_pl)
        return jnp.concatenate(parts, axis=0)            # (nv, B)

    def gram(d_su, d_pl):
        """H = P + A^T D A as (nv, nv, B)."""
        d3 = d_su.reshape(ndim, Ru, B)
        blocks = [[None] * ndim for _ in range(ndim)]
        for k in range(ndim):
            for li in range(k, ndim):
                W = red_c(nscs[k] * nscs[li] * d_pl)     # (MI, B)
                Hkl = _mm(FF.T, W).reshape(nf, nf, B)
                if li == k:
                    Hst = _mm(UU[k], d3[k]).reshape(nf, nf, B)
                    Hkl = Hkl + Hst + Pb
                blocks[k][li] = Hkl
                if li != k:
                    blocks[li][k] = jnp.swapaxes(Hkl, 0, 1)
        rows = [jnp.concatenate(blocks[k], axis=1) for k in range(ndim)]
        return jnp.concatenate(rows, axis=0)             # (nv, nv, B)

    # ------------------------------------------------------------------
    y = y0_ref[:]
    su0, pl0 = mv(y)
    s_sp = jnp.maximum(su0 - bs[0], s_min)
    s_sm = jnp.maximum(-su0 - bs[1], s_min)
    s_pl = jnp.maximum(pl0 - bpl, s_min)
    l_sp = jnp.ones_like(s_sp)
    l_sm = jnp.ones_like(s_sm)
    l_pl = jnp.ones_like(s_pl)
    nr = 2 * ndim * Ru + C * MI
    di = jax.lax.broadcasted_iota(jnp.int32, (nv, nv, 1), 0) == \
        jax.lax.broadcasted_iota(jnp.int32, (nv, nv, 1), 1)

    def Py(y):
        """P y with the lane-varying (nf, nf, B) block: broadcast-reduce
        (nf is tiny; a batched matmul would transpose through lanes)."""
        y3 = y.reshape(ndim, nf, B)
        return jnp.concatenate(
            [jnp.sum(Pb * y3[k][:, None, :], axis=0) for k in range(ndim)],
            axis=0)

    def iteration(carry):
        (it, _, done, y, s_sp, s_sm, s_pl, l_sp, l_sm, l_pl, su, plv,
         r_d) = carry
        rp_sp = su - s_sp - bs[0]
        rp_sm = -su - s_sm - bs[1]
        rp_pl = plv - s_pl - bpl
        mu = (_rowsum(s_sp * l_sp) + _rowsum(s_sm * l_sm) +
              _rowsum(s_pl * l_pl)) / nr

        H = gram(l_sp / s_sp + l_sm / s_sm, l_pl / s_pl)
        diag = jnp.concatenate([H[i, i][None] for i in range(nv)], axis=0)
        ridge = reg * jnp.maximum(_rowsum(diag) / nv, 1.0)   # (B,)
        dsc = jax.lax.rsqrt(diag + ridge[None, :])           # (nv, B)
        Hs = H * dsc[:, None, :] * dsc[None, :, :]
        # dynamic regularization on the scaled unit diagonal: bounds the
        # condition number of the factorization at ~1e6 so f32 pivots
        # stay positive through the interior-point endgame (D spreads of
        # ~1e12 otherwise push trailing pivots negative and the
        # direction turns to garbage); the 1e-6 bias is far below
        # solution accuracy (standard static+dynamic IPM regularization)
        Hs = jnp.where(di, 1.0 + 1e-6, Hs)
        _chol_into(l_scr, Hs, nv)

        def kkt(rc_sp, rc_sm, rc_pl):
            w_su = (rc_sp + l_sp * rp_sp) / s_sp - \
                (rc_sm + l_sm * rp_sm) / s_sm
            w_pl = (rc_pl + l_pl * rp_pl) / s_pl
            rhs = -r_d - rmv(w_su, w_pl)
            dy = dsc * _solve_lanes(l_scr, dsc * rhs, nv)
            dsu, dpl = mv(dy)
            ds_sp = dsu + rp_sp
            ds_sm = -dsu + rp_sm
            ds_pl = dpl + rp_pl
            dl_sp = -(rc_sp + l_sp * ds_sp) / s_sp
            dl_sm = -(rc_sm + l_sm * ds_sm) / s_sm
            dl_pl = -(rc_pl + l_pl * ds_pl) / s_pl
            return dy, (ds_sp, ds_sm, ds_pl), (dl_sp, dl_sm, dl_pl)

        # predictor (affine scaling)
        rc_sp, rc_sm, rc_pl = s_sp * l_sp, s_sm * l_sm, s_pl * l_pl
        dy_a, ds_a, dl_a = kkt(rc_sp, rc_sm, rc_pl)
        a_p = _step_len([s_sp, s_sm, s_pl], list(ds_a))
        a_d = _step_len([l_sp, l_sm, l_pl], list(dl_a))
        mu_aff = (
            _rowsum((s_sp + a_p * ds_a[0]) * (l_sp + a_d * dl_a[0])) +
            _rowsum((s_sm + a_p * ds_a[1]) * (l_sm + a_d * dl_a[1])) +
            _rowsum((s_pl + a_p * ds_a[2]) * (l_pl + a_d * dl_a[2]))) / nr
        sigma = (mu_aff / jnp.maximum(mu, 1e-30)) ** 3
        sm = sigma * mu

        # corrector
        rc_c = (rc_sp + ds_a[0] * dl_a[0] - sm[None, :],
                rc_sm + ds_a[1] * dl_a[1] - sm[None, :],
                rc_pl + ds_a[2] * dl_a[2] - sm[None, :])
        dy, ds, dl = kkt(*rc_c)
        a_p = _step_len([s_sp, s_sm, s_pl], list(ds))
        a_d = _step_len([l_sp, l_sm, l_pl], list(dl))

        # Gondzio centrality correctors (see ops/qp.py _ipm): re-center
        # outlier complementarity products reusing the SAME VMEM factor
        # -- the LSC row replication makes duals degenerate and plain
        # Mehrotra's gap plateaus ~1e-2 at congestion; each corrector
        # costs two extra triangular substitutions, no factorization.
        for _ in range(correctors):
            mu_t = sm[None, :]
            svars = (s_sp, s_sm, s_pl)
            lvars = (l_sp, l_sm, l_pl)
            rc_n = []
            for v, (sv, lv, dsv, dlv) in enumerate(
                    zip(svars, lvars, ds, dl)):
                s_t = sv + a_p * dsv if v < 2 else sv + a_p[None] * dsv
                l_t = lv + a_d * dlv if v < 2 else lv + a_d[None] * dlv
                prod = s_t * l_t
                target = jnp.clip(prod, 0.1 * mu_t, 10.0 * mu_t)
                rc_n.append(rc_c[v] + (target - prod))
            dy2, ds2, dl2 = kkt(*rc_n)
            a_p2 = _step_len([s_sp, s_sm, s_pl], list(ds2))
            a_d2 = _step_len([l_sp, l_sm, l_pl], list(dl2))
            # material-improvement margin: see ops/qp.py _ipm
            better = (a_p2 + a_d2 > a_p + a_d + 0.05).astype(jnp.float32)
            nb = 1.0 - better

            def mix(new, old, b=better, n=nb):
                shape = (1,) * (new.ndim - 1) + (new.shape[-1],)
                return new * b.reshape(shape) + old * n.reshape(shape)
            dy = mix(dy2, dy)
            ds = tuple(mix(a2, a1) for a2, a1 in zip(ds2, ds))
            dl = tuple(mix(a2, a1) for a2, a1 in zip(dl2, dl))
            rc_c = tuple(mix(a2, a1) for a2, a1 in zip(rc_n, rc_c))
            a_p = a_p2 * better + a_p * nb
            a_d = a_d2 * better + a_d * nb

        # f32 fixed-point detector: the primal step this iteration
        # actually applies, per lane
        step_disp = a_p * _rowmax(jnp.abs(dy))
        y_n = y + a_p[None, :] * dy
        s_sp_n = jnp.maximum(s_sp + a_p * ds[0], 1e-12)
        s_sm_n = jnp.maximum(s_sm + a_p * ds[1], 1e-12)
        s_pl_n = jnp.maximum(s_pl + a_p[None] * ds[2], 1e-12)
        l_sp_n = jnp.maximum(l_sp + a_d * dl[0], 1e-12)
        l_sm_n = jnp.maximum(l_sm + a_d * dl[1], 1e-12)
        l_pl_n = jnp.maximum(l_pl + a_d[None] * dl[2], 1e-12)
        # NaN guard: a lane whose factorization degenerates holds its
        # previous (warm-started, feasible) iterate.  A degenerate step
        # surfaces in dy (hence y_n) or the step lengths; full-buffer
        # isfinite sweeps over s/lam would cost ~9M VPU ops per tile.
        # The per-lane `done` LATCH rides the same mask: once a lane has
        # satisfied the full exit triple it FREEZES -- iterating a
        # converged warm-started lane past its f32 fixed point is not
        # neutral (observed on TPU: mu gets driven to ~1e-12, centering
        # dies, and duals of active rows decay until the true dual
        # residual is O(100) while complementarity still looks perfect).
        ok = (_rowsum(jnp.where(jnp.isfinite(y_n), 0.0, 1.0)) == 0.0) & \
            jnp.isfinite(a_p) & jnp.isfinite(a_d) & \
            jnp.isfinite(mu_aff) & jnp.isfinite(sigma) & (done < 0.5)

        def sel(a, b):
            shape = (1,) * (a.ndim - 1) + (B,)
            return jnp.where(ok.reshape(shape), a, b)

        y_n = sel(y_n, y)
        s_sp_n, s_sm_n, s_pl_n = (sel(s_sp_n, s_sp), sel(s_sm_n, s_sm),
                                  sel(s_pl_n, s_pl))
        l_sp_n, l_sm_n, l_pl_n = (sel(l_sp_n, l_sp), sel(l_sm_n, l_sm),
                                  sel(l_pl_n, l_pl))

        # convergence test on the NEW iterate (next iteration's mv AND
        # dual residual are hoisted here so they cost nothing extra):
        # every lane at complementarity gap < tol_gap with primal
        # residual < tol_rp AND dual residual < tol_rd.  The dual term
        # is load-bearing: a warm start at the previous cycle's optimum
        # collapses mu in 1-2 iterations while y is still stale -- mu +
        # r_p alone exit with the old point and the agent hovers (the
        # round-3 endgame-stall regression; see ops/qp.py _ipm).
        # A NaN-frozen lane reports converged=False and rides to the cap.
        # Pad lanes (valid == 0: the dummy QPs filling the last partial
        # tile) count as converged -- their identity-P/zero-q problems
        # start at mu ~ 1 and would otherwise pin the whole tile to the
        # iteration cap, silently disabling early exit for swarms
        # smaller than the lane-tile size.
        su_n, plv_n = mv(y_n)
        rd_n = Py(y_n) + q - rmv(l_sp_n - l_sm_n, l_pl_n)
        mu_n = (_rowsum(s_sp_n * l_sp_n) + _rowsum(s_sm_n * l_sm_n) +
                _rowsum(s_pl_n * l_pl_n)) / nr
        rpm = jnp.maximum(
            _rowmax(jnp.abs(su_n - s_sp_n - bs[0])),
            jnp.maximum(_rowmax(jnp.abs(-su_n - s_sm_n - bs[1])),
                        _rowmax(jnp.abs(plv_n - s_pl_n - bpl))))
        # tol_rd is ABSOLUTE raw-gradient units (see ops/qp.py _ipm:
        # the stale-point residual ~ 2 w_t dist is O(1) regardless of
        # the jerk-Gram sigma; at congested scales the f32 r_d noise
        # floor exceeds tol_rd and the cap soundly governs)
        rdm = _rowmax(jnp.abs(rd_n))
        # A lane is done when complementarity + primal feasibility hold
        # AND either the dual residual certifies stationarity or the
        # applied step has collapsed below tol_step.  The step clause is
        # the f32 fixed-point detector: the r_d EVALUATION has a noise
        # floor that grows with the dual magnitudes (>= 4 raw units at
        # 1024-agent congestion even for fully-converged lanes), so a
        # lane that cannot certify r_d would otherwise iterate past its
        # fixed point and DEGRADE (centering dies, active-row duals
        # decay -- the same pathology the latch exists to stop).  A
        # tiny applied step with mu/r_p converged means continued
        # iteration provably cannot improve the iterate; freezing it is
        # strictly better than the degradation that follows.
        lane_done = (valid < 0.5) | (done > 0.5) | \
            (ok & (mu_n < tol_gap * sig) & (rpm < tol_rp) &
             ((rdm < tol_rd) | (step_disp < tol_step)))
        done_n = jnp.where(lane_done, 1.0, 0.0)
        conv = (jnp.min(done_n) > 0.5).astype(jnp.int32)
        if _IPM_DEBUG:
            live = valid > 0.5
            jax.debug.print(
                "k it={i} mu={m:.2e} tolg={t:.2e} rpm={p:.2e} "
                "rdm={d:.2e} conv={c}", i=it,
                m=jnp.max(jnp.where(live, mu_n, 0.0)),
                t=jnp.max(jnp.where(live, tol_gap * sig, 0.0)),
                p=jnp.max(jnp.where(live, rpm, 0.0)),
                d=jnp.max(jnp.where(live, rdm, 0.0)), c=conv)

        return (it + 1, conv, done_n, y_n, s_sp_n, s_sm_n, s_pl_n,
                l_sp_n, l_sm_n, l_pl_n, su_n, plv_n, rd_n)

    rd0 = Py(y) + q - rmv(l_sp - l_sm, l_pl)
    done0 = jnp.where(valid < 0.5, 1.0, 0.0)        # pad lanes pre-done
    carry = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
             done0, y, s_sp, s_sm, s_pl, l_sp, l_sm, l_pl, su0, pl0, rd0)
    carry = jax.lax.while_loop(
        lambda c: jnp.logical_and(c[0] < iters, c[1] == 0),
        iteration, carry)
    it, _, _, y, s_sp, s_sm, s_pl, l_sp, l_sm, l_pl = carry[:10]

    y_ref[:] = y
    lam_s_ref[0] = l_sp
    lam_s_ref[1] = l_sm
    lam_p_ref[:] = l_pl
    gap_ref[0] = (_rowsum(s_sp * l_sp) + _rowsum(s_sm * l_sm) +
                  _rowsum(s_pl * l_pl)) / nr
    gap_ref[1] = jnp.full((B,), 1.0, jnp.float32) * it.astype(jnp.float32)


@partial(jax.jit, static_argnames=("iters", "reg", "s_min", "interpret",
                                   "block_b", "tol_gap", "tol_rp",
                                   "tol_rd", "tol_step", "correctors"))
def ipm_lsc_fused(P_blk, q, y0, U, b_pairs, nsc, scale, b_pl, F_seg,
                  sigma=None,
                  iters: int = 14, reg: float = 1e-8, s_min: float = 1.0,
                  interpret: bool = False, block_b: int = 128,
                  tol_gap: float = 1e-3, tol_rp: float = 1e-4,
                  tol_rd: float = 0.05, tol_step: float = 0.0,
                  correctors: int = 0):
    """Solve the whole swarm's LSC QPs in one fused Pallas launch.

    P_blk (N, nf, nf); q/y0 (N, nv); U (ndim, Ru, nf) pre-scaled unique
    static rows; b_pairs (N, 2, ndim*Ru) [+rows, -rows] scaled bounds;
    nsc (N, C, M, 3) normals; scale (N, C, M, n1) row scales
    (0 = masked); b_pl (N, C, M, n1) scaled bounds (-1 = masked); F_seg
    (M, n1, nf).

    Returns (y (N, nv), lam_static (N, 2, ndim*Ru), lam_planes
    (N, C*M*n1) c-major, gap (N,)).

    iters is a CAP: each 128-lane tile exits its iteration loop as soon
    as every lane reaches complementarity gap < tol_gap * sigma with
    primal residual < tol_rp and dual residual < tol_rd * sigma, where
    sigma (N,) is the per-agent objective scale (mean |diag P|; makes
    the tolerances relative to the ~1e4 jerk-Gram magnitude).
    Warm-started steady-state cycles converge in far fewer than the
    cap, and the whole tile's remaining iterations are real skipped
    work, not masked lanes.
    """
    N, nf = P_blk.shape[0], P_blk.shape[-1]
    ndim, Ru = U.shape[0], U.shape[1]
    C, M, n1 = nsc.shape[1], nsc.shape[2], scale.shape[-1]
    nv = ndim * nf
    MI = M * n1
    f32 = jnp.float32

    Np = max(((N + block_b - 1) // block_b) * block_b, block_b)

    def lanes(x, shape, pad=0.0):
        x = jnp.moveaxis(x.reshape((N,) + shape).astype(f32), 0, -1)
        if Np != N:
            x = jnp.concatenate(
                [x, jnp.full(shape + (Np - N,), pad, f32)], axis=-1)
        return x

    Pb_l = lanes(P_blk, (nf, nf))
    if Np != N:
        pad_eye = jnp.broadcast_to(jnp.eye(nf, dtype=f32)[..., None],
                                   (nf, nf, Np - N))
        Pb_l = Pb_l.at[..., N:].add(pad_eye)
    q_l = lanes(q, (nv,))
    y0_l = lanes(y0, (nv,))
    bs_l = lanes(b_pairs, (2, ndim * Ru), pad=-1.0)
    # normals dimension-major and pre-expanded over the control-point
    # index: (ndim, C*M*n1, B) rows in (c, m, i) c-major order
    nsc_e = jnp.repeat(
        jnp.moveaxis(nsc.astype(f32), 3, 1)[..., None], n1, axis=-1)
    nsc_l = lanes(nsc_e.reshape(N, ndim, C * MI), (ndim, C * MI))
    scale_l = lanes(scale, (C * MI,))
    bpl_l = lanes(b_pl, (C * MI,), pad=-1.0)
    valid_l = lanes(jnp.ones((N, 1), f32), (1,), pad=0.0)
    if sigma is None:
        sigma = jnp.ones((N,), f32)
    sig_l = lanes(sigma.reshape(N, 1), (1,), pad=1.0)

    Fseg2 = jnp.asarray(F_seg, f32).reshape(MI, nf)
    FF2 = (Fseg2[:, :, None] * Fseg2[:, None, :]).reshape(MI, nf * nf)
    U_j = jnp.asarray(U, f32)
    UU = (U_j[:, :, :, None] * U_j[:, :, None, :]).reshape(
        ndim, Ru, nf * nf)
    UU = jnp.swapaxes(UU, 1, 2)                       # (ndim, nf*nf, Ru)

    grid = (Np // block_b,)

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape + (block_b,),
                            lambda b, nd=nd: (0,) * nd + (b,),
                            memory_space=pltpu.VMEM)

    def sspec(shape):
        return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    y_l, lam_s_l, lam_p_l, gap_l = pl.pallas_call(
        partial(_ipm_kernel, iters=iters, ndim=ndim, nf=nf, Ru=Ru, C=C,
                M=M, n1=n1, reg=reg, s_min=s_min, tol_gap=tol_gap,
                tol_rp=tol_rp, tol_rd=tol_rd, tol_step=tol_step,
                correctors=correctors),
        grid=grid,
        in_specs=[bspec((nf, nf)), bspec((nv,)), bspec((nv,)),
                  sspec((ndim, Ru, nf)), sspec((ndim, nf * nf, Ru)),
                  bspec((2, ndim * Ru)), bspec((ndim, C * MI)),
                  bspec((C * MI,)), bspec((C * MI,)),
                  sspec((MI, nf)), sspec((MI, nf * nf)),
                  bspec((1,)), bspec((1,))],
        out_specs=(bspec((nv,)), bspec((2, ndim * Ru)), bspec((C * MI,)),
                   bspec((2,))),
        out_shape=(jax.ShapeDtypeStruct((nv, Np), f32),
                   jax.ShapeDtypeStruct((2, ndim * Ru, Np), f32),
                   jax.ShapeDtypeStruct((C * MI, Np), f32),
                   jax.ShapeDtypeStruct((2, Np), f32)),
        scratch_shapes=[pltpu.VMEM((nv, nv, block_b), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(Pb_l, q_l, y0_l, U_j, UU, bs_l, nsc_l, scale_l, bpl_l, Fseg2, FF2,
      valid_l, sig_l)

    y = jnp.moveaxis(y_l[..., :N], -1, 0)
    lam_s = jnp.moveaxis(lam_s_l[..., :N], -1, 0)
    lam_p = jnp.moveaxis(lam_p_l[..., :N], -1, 0).reshape(N, C * MI)
    gap = gap_l[0, :N]
    iters_used = gap_l[1, :N]     # per-lane tile iteration count
    return y, lam_s, lam_p, gap, iters_used
