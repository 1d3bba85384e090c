"""Batched dense convex QP solver (primal-dual interior point).

TPU-native replacement for the per-agent CPLEX dual-simplex solve
(reference ``src/traj_optimizer.cpp:31-154``): instead of one 90-variable QP
at a time on 10 CPU threads, we solve the whole swarm's QPs as one batched
tensor program,

    min_y  1/2 y^T P y + q^T y    s.t.  A y >= b          (rows maskable)

with P (N, nv, nv), A (N, nr, nv).  Equality constraints are eliminated
upstream (see planner/optimizer.py), which both shrinks the KKT system and
removes the reference's free-variable special cases.

Method: Mehrotra predictor-corrector with normal-equations elimination;
every iteration forms  H = P + A^T D A  (an MXU-friendly batched matmul),
takes one batched Cholesky, and reuses the factor for the predictor and
corrector solves.  Iteration count is static for jit; masked rows are
implemented by zeroing their A rows and giving them a trivially-satisfied
bound so their duals decay to ~0.

Infeasibility diagnostics (the analog of CPLEX conflict refinement,
traj_optimizer.cpp:104-137) are returned as the per-row violation of the
final iterate; callers report argmax rows.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QPSolution(NamedTuple):
    y: jnp.ndarray          # (..., nv) primal solution
    lam: jnp.ndarray        # (..., nr) dual solution
    obj: jnp.ndarray        # (...,)   0.5 y'Py + q'y
    primal_res: jnp.ndarray  # (...,)  max_i max(b_i - a_i'y, 0)
    gap: jnp.ndarray        # (...,)   complementarity mu


def _masked(A, b, mask):
    """Zero out masked rows and make their bound trivially satisfied."""
    if mask is None:
        return A, b
    m = mask[..., None]
    return jnp.where(m, A, 0.0), jnp.where(mask, b, -1.0)


def _cholesky(Hs):
    """Batched Cholesky: Pallas batch-in-lanes kernel on TPU (XLA's batched
    small-matrix Cholesky is the IPM's dominant cost there), jnp fallback
    elsewhere / for f64 validation runs."""
    if (jax.default_backend() == "tpu" and Hs.ndim == 3
            and Hs.dtype == jnp.float32):
        from .chol_pallas import cholesky_batched
        return cholesky_batched(Hs)
    return jnp.linalg.cholesky(Hs)


def _chol_solve(L, rhs):
    """Solve (L L^T) x = rhs with batched triangular solves; rhs (..., n)."""
    z = jax.lax.linalg.triangular_solve(L, rhs[..., None], left_side=True,
                                        lower=True)
    x = jax.lax.linalg.triangular_solve(L, z, left_side=True, lower=True,
                                        transpose_a=True)
    return x[..., 0]


def _chol_inverse(L):
    """Explicit H^{-1} = L^{-T} L^{-1} from the Cholesky factor.

    One wide triangular solve + one MXU matmul per iteration beats the
    four narrow (single-rhs) triangular-solve custom calls the predictor/
    corrector pair would otherwise issue -- batched skinny TriangularSolve
    is latency-bound on TPU.
    """
    n = L.shape[-1]
    eye = jnp.eye(n, dtype=L.dtype)
    eye = jnp.broadcast_to(eye, L.shape)
    Linv = jax.lax.linalg.triangular_solve(L, eye, left_side=True,
                                           lower=True)
    return jnp.einsum("...ki,...kj->...ij", Linv, Linv)


def solve_qp(P, q, A, b, mask=None, y0=None, iters: int = 20,
             reg: float = 1e-8, s_min: float = 1.0,
             equilibrate: bool = True) -> QPSolution:
    """Batched inequality-form QP solve; see module docstring.

    All arrays share leading batch dims.  `y0` is an optional warm start
    (the LSC-shifted previous solution is feasible by construction, which is
    what makes warm starting effective here).  `s_min` floors the initial
    slacks: starting well-centered (s ~ 1, lam ~ 1) matters more for
    Mehrotra than starting primal-feasible.
    """
    with jax.default_matmul_precision("highest"):
        return _solve_qp_impl(P, q, A, b, mask, y0, iters, reg, s_min,
                              equilibrate)


def _solve_qp_impl(P, q, A, b, mask, y0, iters, reg, s_min, equilibrate):
    # NOTE: runs under matmul precision "highest" -- TPU's default bf16
    # passes for f32 matmuls break the positive definiteness of
    # H = P + A'DA and make the batched Cholesky produce NaNs.
    dtype = P.dtype
    nv = P.shape[-1]
    nr = A.shape[-2]
    A, b = _masked(A, b, mask)

    # --- row equilibration: scale each constraint row to unit norm ---
    if equilibrate:
        row_norm = jnp.sqrt(jnp.sum(A * A, axis=-1) + 1e-12)
        row_scale = jnp.where(row_norm > 1e-9, 1.0 / row_norm, 1.0)
        A = A * row_scale[..., None]
        b = b * row_scale

    if y0 is None:
        y0 = jnp.zeros(P.shape[:-1], dtype)

    s0 = jnp.maximum(jnp.einsum("...rv,...v->...r", A, y0) - b, s_min)
    lam0 = jnp.ones_like(s0)
    eye = jnp.eye(nv, dtype=dtype)

    def kkt_solve(L, dsc, A, lam, s, r_d, r_p, r_c):
        # (P + A'DA) dy = -r_d - A' [ (r_c + lam*r_p) / s ],
        # solved through the Jacobi-equilibrated Cholesky factor
        rhs = -r_d - jnp.einsum("...rv,...r->...v", A,
                                (r_c + lam * r_p) / s)
        dy = dsc * _chol_solve(L, dsc * rhs)
        ds = jnp.einsum("...rv,...v->...r", A, dy) + r_p
        dlam = -(r_c + lam * ds) / s
        return dy, ds, dlam

    def step_len(v, dv, tau=0.995):
        # largest alpha in (0, 1] with v + alpha dv >= (1-tau) v
        ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0),
                          jnp.inf)
        alpha = jnp.min(ratio, axis=-1)
        return jnp.minimum(1.0, tau * alpha)

    def body(carry, _):
        y, lam, s = carry
        Ay = jnp.einsum("...rv,...v->...r", A, y)
        r_d = jnp.einsum("...vw,...w->...v", P, y) + q - \
            jnp.einsum("...rv,...r->...v", A, lam)
        r_p = Ay - s - b
        mu = jnp.mean(s * lam, axis=-1)

        D = lam / s
        H = P + jnp.einsum("...rv,...r,...rw->...vw", A, D, A)
        # relative ridge: f32 rounding at the ~1e4 scale of the jerk Gram
        # can cost positive-definiteness; an absolute 1e-8 is invisible
        diag_mean = jnp.einsum("...vv->...", H) / nv
        ridge = reg * jnp.maximum(diag_mean, 1.0)
        H = H + ridge[..., None, None] * eye
        # Jacobi equilibration before factorizing: f32 Cholesky at the
        # jerk-Gram's ~1e4 scale with interior-point D spreads loses
        # accuracy without it
        dsc = jax.lax.rsqrt(jnp.einsum("...vv->...v", H))
        Hs = H * dsc[..., :, None] * dsc[..., None, :]
        L = _cholesky(Hs)

        # predictor (affine scaling)
        r_c_aff = s * lam
        dy_a, ds_a, dlam_a = kkt_solve(L, dsc, A, lam, s, r_d, r_p,
                                       r_c_aff)
        a_p = step_len(s, ds_a)
        a_d = step_len(lam, dlam_a)
        mu_aff = jnp.mean((s + a_p[..., None] * ds_a) *
                          (lam + a_d[..., None] * dlam_a), axis=-1)
        sigma = (mu_aff / jnp.maximum(mu, 1e-30)) ** 3

        # corrector
        r_c = s * lam + ds_a * dlam_a - (sigma * mu)[..., None]
        dy, ds, dlam = kkt_solve(L, dsc, A, lam, s, r_d, r_p, r_c)
        a_p = step_len(s, ds)
        a_d = step_len(lam, dlam)
        y_n = y + a_p[..., None] * dy
        s_n = jnp.maximum(s + a_p[..., None] * ds, 1e-12)
        lam_n = jnp.maximum(lam + a_d[..., None] * dlam, 1e-12)
        # NaN guard: an agent whose factorization degenerates holds its
        # previous (warm-started, feasible) iterate instead of poisoning
        # the batch
        ok = (jnp.all(jnp.isfinite(y_n), axis=-1) &
              jnp.all(jnp.isfinite(s_n), axis=-1) &
              jnp.all(jnp.isfinite(lam_n), axis=-1))
        y = jnp.where(ok[..., None], y_n, y)
        s = jnp.where(ok[..., None], s_n, s)
        lam = jnp.where(ok[..., None], lam_n, lam)
        return (y, lam, s), None

    (y, lam, s), _ = jax.lax.scan(body, (y0, lam0, s0), None, length=iters)

    obj = 0.5 * jnp.einsum("...v,...vw,...w->...", y, P, y) + \
        jnp.einsum("...v,...v->...", q, y)
    viol = jnp.maximum(b - jnp.einsum("...rv,...v->...r", A, y), 0.0)
    primal_res = jnp.max(viol, axis=-1)
    gap = jnp.mean(s * lam, axis=-1)
    return QPSolution(y=y, lam=lam, obj=obj, primal_res=primal_res, gap=gap)


def violation_report(A, b, y, mask=None, top_k: int = 5):
    """Per-row violations of A y >= b at y -- the conflict-refinement analog
    (traj_optimizer.cpp:104-137).  Returns (values, row indices), largest
    violations first."""
    A, b = _masked(A, b, mask)
    viol = b - jnp.einsum("...rv,...v->...r", A, y)
    vals, idx = jax.lax.top_k(viol, top_k)
    return vals, idx
