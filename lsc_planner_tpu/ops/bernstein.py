"""Bernstein-polynomial algebra, batched for TPU.

Covers the capability surface of the reference header-only polynomial library
(``include/polynomial.hpp``): basis construction, curve evaluation,
derivative control points, flat-output state extraction with body rates,
least-squares fitting, subdivision, and the jerk-cost Gram matrix used by the
trajectory QP (``src/traj_optimizer.cpp:169-184`` buildQBase).

Design notes (TPU-first):
 - All static, shape-only matrices (basis-change B, Q_base, subdivision A)
   are built once in float64 numpy at setup and cast to the device dtype;
   nothing here branches on traced values.
 - Curve evaluation is expressed as small matmul/einsum contractions over a
   trailing (n+1) axis so XLA fuses them; callers vmap over agents/segments.
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

GRAVITY = 9.81


def nchoosek(n: int, k: int) -> int:
    if k < 0 or k > n:
        return 0
    return math.comb(n, k)


def coef_derivative(i: int, k: int) -> int:
    """Falling factorial i*(i-1)*...*(i-k+1); 0 when i < k
    (reference polynomial.hpp:224-234)."""
    if i < k:
        return 0
    c = 1
    for j in range(k):
        c *= i - j
    return c


@lru_cache(maxsize=None)
def bernstein_matrix(n: int) -> np.ndarray:
    """Bernstein->monomial basis-change matrix B, (n+1, n+1) float64.

    Defined such that for control points c (shape n+1) the monomial
    coefficients of p(t) = sum_i c_i b_{i,n}(t) are  a = B^T c, i.e.
    p(t) = sum_j (B^T c)_j t^j.  Matches buildBernsteinBasis
    (polynomial.hpp:415-428): B[i, j] = C(n,i) C(n-i,n-j) (-1)^{j-i}, j>=i.
    """
    B = np.zeros((n + 1, n + 1))
    for i in range(n + 1):
        for j in range(i, n + 1):
            B[i, j] = nchoosek(n, i) * nchoosek(n - i, n - j) * (-1.0) ** (j - i)
    return B


@lru_cache(maxsize=None)
def bernstein_matrix_inv(n: int) -> np.ndarray:
    return np.linalg.inv(bernstein_matrix(n))


def bernstein_basis(n: int, t):
    """Row of basis values b_{i,n}(t) for traced t; shape t.shape + (n+1,)."""
    t = jnp.asarray(t)
    i = jnp.arange(n + 1)
    binom = jnp.asarray([nchoosek(n, k) for k in range(n + 1)],
                        dtype=t.dtype)
    tt = t[..., None]
    # t^i (1-t)^(n-i) with 0^0 := 1 handled via where
    def safe_pow(base, expo):
        return jnp.where(expo == 0, 1.0, base[...] ** expo)
    return binom * safe_pow(tt, i) * safe_pow(1.0 - tt, n - i)


def bernstein_eval(ctrl, t):
    """Evaluate a Bernstein curve at normalized time t in [0, 1].

    ctrl: (..., n+1, d) control points;  t: scalar or broadcastable to (...,).
    Returns (..., d).  (reference getPointFromControlPoints,
    polynomial.hpp:26-61)
    """
    n = ctrl.shape[-2] - 1
    basis = bernstein_basis(n, jnp.asarray(t, dtype=ctrl.dtype))
    return jnp.einsum("...i,...id->...d", basis, ctrl)


def derivative_ctrl(ctrl, seg_time):
    """Control points of the derivative curve: n*(c_{i+1}-c_i)/T.
    ctrl: (..., n+1, d) -> (..., n, d)."""
    n = ctrl.shape[-2] - 1
    return (ctrl[..., 1:, :] - ctrl[..., :-1, :]) * (n / seg_time)


def traj_state(traj, t, dt):
    """Flat-output state extraction along a piecewise Bernstein trajectory.

    traj: (M, n+1, 3) control points, segment time dt; t: scalar time in
    [0, M*dt].  Returns dict(pos, vel, acc, jerk, omega) -- position through
    jerk plus body rates from the thrust direction (reference
    getStateFromControlPoints, polynomial.hpp:63-121).
    Fully traceable: segment index via clamped floor division.
    """
    M, npts, d = traj.shape
    n = npts - 1
    tt = jnp.asarray(t, dtype=traj.dtype)
    m = jnp.clip(jnp.floor(tt / dt).astype(jnp.int32), 0, M - 1)
    tau = tt / dt - m.astype(traj.dtype)
    seg = traj[m]                                # (n+1, 3)
    vel_c = derivative_ctrl(seg, dt)             # (n, 3)
    acc_c = derivative_ctrl(vel_c, dt)           # (n-1, 3)
    jerk_c = derivative_ctrl(acc_c, dt)          # (n-2, 3)
    pos = bernstein_eval(seg, tau)
    vel = bernstein_eval(vel_c, tau)
    acc = bernstein_eval(acc_c, tau)
    jerk = bernstein_eval(jerk_c, tau)

    thrust = acc + jnp.array([0.0, 0.0, GRAVITY], dtype=traj.dtype)
    tnorm = jnp.linalg.norm(thrust)
    z_body = thrust / jnp.maximum(tnorm, 1e-9)
    x_world = jnp.array([1.0, 0.0, 0.0], dtype=traj.dtype)
    y_body = jnp.cross(z_body, x_world)
    y_body = y_body / jnp.maximum(jnp.linalg.norm(y_body), 1e-9)
    x_body = jnp.cross(y_body, z_body)
    jerk_orth = jerk - z_body * jnp.dot(jerk, z_body)
    h_w = jerk_orth / jnp.maximum(tnorm, 1e-9)
    omega = jnp.stack([-jnp.dot(h_w, y_body), jnp.dot(h_w, x_body),
                       jnp.zeros((), dtype=traj.dtype)])
    return {"pos": pos, "vel": vel, "acc": acc, "jerk": jerk, "omega": omega}


def traj_state_batch(trajs, t, dt):
    """vmap of traj_state over a leading agent axis: trajs (N, M, n+1, 3)."""
    return jax.vmap(lambda tr: traj_state(tr, t, dt))(trajs)


def bernstein_fitting(targets, ts):
    """Least-squares control points through target points at normalized
    times (reference bernsteinFitting, polynomial.hpp:198-222).
    targets: (n+1, d), ts: (n+1,). Exact interpolation (square system).
    """
    n = targets.shape[0] - 1
    basis = bernstein_basis(n, ts)    # (n+1, n+1): rows = times
    return jnp.linalg.solve(basis, targets)


@lru_cache(maxsize=None)
def q_base(n: int, phi: int, phi_n: int, dt: float) -> np.ndarray:
    """Per-segment derivative-energy Gram matrix in control-point space.

    Q[i,j] = sum_{k=phi-phi_n+1..phi} dt^{1-2k} *
             (B Z_k B^T)[i,j],  Z_k[i,j] = c(i,k) c(j,k) / (i+j-2k+1)
    (reference buildQBase, traj_optimizer.cpp:169-184).  The QP cost per
    dimension is  c^T Q c  summed over segments.
    """
    B = bernstein_matrix(n)
    Q = np.zeros((n + 1, n + 1))
    for k in range(phi, phi - phi_n, -1):
        Z = np.zeros((n + 1, n + 1))
        for i in range(n + 1):
            for j in range(n + 1):
                if i + j - 2 * k + 1 > 0:
                    Z[i, j] = (coef_derivative(i, k) * coef_derivative(j, k)
                               / (i + j - 2 * k + 1))
        Z = B @ Z @ B.T
        Q += Z * dt ** (-2 * k + 1)
    return Q


@lru_cache(maxsize=None)
def subdivision_matrix(n: int, a: float, b: float) -> np.ndarray:
    """Matrix S with c_sub = S^T applied on control points: restriction of a
    Bernstein curve to [a, b] re-expressed in Bernstein form (reference
    subdivisionBernsteinCurve, polynomial.hpp:430-455).

    Returns (n+1, n+1) S such that new control points = c @ S for row-vector
    c (i.e. einsum('...i,ij->...j', ctrl, S) per dimension).
    """
    B = bernstein_matrix(n)
    A = np.zeros((n + 1, n + 1))
    for i in range(n + 1):
        for j in range(i + 1):
            A[i, j] = nchoosek(i, j) * (a ** j) * (b ** (i - j))
    return B @ A @ np.linalg.inv(B)


def subdivide(ctrl, a: float, b: float):
    """Restrict Bernstein curve to sub-interval; ctrl (..., n+1, d)."""
    n = ctrl.shape[-2] - 1
    S = jnp.asarray(subdivision_matrix(n, a, b), dtype=ctrl.dtype)
    return jnp.einsum("ji,...jd->...id", S, ctrl)
