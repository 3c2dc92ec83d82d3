"""Riccati recursions as XLA-native scans.

Replaces the reference's Python-loop Riccati iterations (reference:
autompc/control/lqr.py:15-47) and provides the time-varying backward pass
used by iLQR (ilqr.py:165-187) as a ``lax.scan``, plus an associative-scan
formulation that parallelizes the backward pass over the horizon
(sequence-dimension parallelism for the time axis; cf. SURVEY.md §5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_small(A, b):
    """Linear solve specialized for the tiny control-dimension systems
    MPC produces: closed forms for 1x1/2x2 (a general LU lowers to a
    far more expensive kernel than a reciprocal on TPU), LU fallback
    otherwise."""
    n = A.shape[0]
    if n == 1:
        return b / A[0, 0]
    if n == 2:
        det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
        inv = (
            jnp.array([[A[1, 1], -A[0, 1]], [-A[1, 0], A[0, 0]]]) / det
        )
        return inv @ b
    return jnp.linalg.solve(A, b)


def dynamic_riccati_step(P, A, B, Q, R, N):
    """One step of the discrete-time dynamic Riccati equation
    (lqr.py:15-20 semantics)."""
    BtP = B.T @ P
    G = R + BtP @ B
    H = BtP @ A + N.T
    return A.T @ P @ A - (A.T @ P @ B + N) @ jnp.linalg.solve(G, H) + Q


def lqr_gain(A, B, P, R, N=None):
    """K = -(R + B'PB)^{-1} B'PA  (lqr.py:30-33, 44)."""
    BtP = B.T @ P
    rhs = BtP @ A if N is None else BtP @ A + N.T
    return -jnp.linalg.solve(R + BtP @ B, rhs)


def finite_horizon_lqr(A, B, Q, R, N, F, horizon: int):
    """Finite-horizon LQR gain.

    Reference semantics (lqr.py:35-47): start from P = F and apply the
    Riccati step ``horizon + 1`` times, then form the gain from the final
    P. Returns (K, P).
    """

    def body(_, P):
        return dynamic_riccati_step(P, A, B, Q, R, N)

    P = jax.lax.fori_loop(0, horizon + 1, body, F)
    return lqr_gain(A, B, P, R, N), P


def infinite_horizon_lqr(A, B, Q, R, N=None, threshold=1e-3, max_iter=10000):
    """Infinite-horizon LQR via Riccati fixed-point iteration.

    The reference's ``InfiniteHorizonLQR`` calls an undefined ``dare``
    (lqr.py:104 — broken); its ``_inf_horz_dt_lqr`` helper (lqr.py:22-33)
    defines the intended semantics: iterate until ``max|P1 - P2| <
    threshold``. Implemented here as a bounded ``while_loop``.
    """
    if N is None:
        N = jnp.zeros((A.shape[0], B.shape[1]), dtype=A.dtype)

    def cond(carry):
        P_prev, P, it = carry
        return (jnp.max(jnp.abs(P - P_prev)) > threshold) & (it < max_iter)

    def body(carry):
        _, P, it = carry
        return P, dynamic_riccati_step(P, A, B, Q, R, N), it + 1

    P0 = Q
    P1 = dynamic_riccati_step(P0, A, B, Q, R, N)
    _, P, _ = jax.lax.while_loop(cond, body, (P0, P1, jnp.array(0)))
    return lqr_gain(A, B, P, R, N), P


# ---------------------------------------------------------------------------
# Time-varying LQR backward pass (the iLQR inner recursion)
# ---------------------------------------------------------------------------


def tvlqr_backward_scan(Jacs_x, Jacs_u, Cxx, Cuu, cx, cu, Vn, vn, unroll=1):
    """Sequential time-varying LQR backward pass as one ``lax.scan``.

    Mirrors the reference iLQR backward recursion (ilqr.py:165-187):
    at each step t (scanned in reverse),

      Qt = C_t + J_t' V J_t,   qt = c_t + J_t' v
      K_t = -Quu^{-1} Qux,     k_t = -Quu^{-1} qu
      V  <- Qxx + Qxu K + K' Qux + K' Quu K
      v  <- qx + Qxu k + K'(qu + Quu k)

    Parameters
    ----------
    Jacs_x : (H, ds, ds), Jacs_u : (H, ds, dc) dynamics Jacobians
    Cxx : (H, ds, ds), Cuu : (H, dc, dc) stage cost Hessians (dt-scaled)
    cx : (H, ds), cu : (H, dc) stage cost gradients (dt-scaled)
    Vn : (ds, ds), vn : (ds,) terminal value expansion

    Returns
    -------
    Ks : (H, dc, ds), ks : (H, dc), lin_red : scalar, quad_red : scalar
        Gains plus the accumulated expected linear/quadratic cost
        reductions used by the line-search acceptance test
        (ilqr.py:181-183, 208-214).
    """

    def step(carry, inp):
        V, v, lin_red, quad_red = carry
        Jx, Ju, Qx, Ru, qx, ru = inp
        # Q-function expansion blocks.
        JxV = Jx.T @ V
        JuV = Ju.T @ V
        Qxx = Qx + JxV @ Jx
        Quu = Ru + JuV @ Ju
        Qux = JuV @ Jx
        qx_t = qx + Jx.T @ v
        qu_t = ru + Ju.T @ v
        K = -solve_small(Quu, Qux)
        k = -solve_small(Quu, qu_t)
        lin_red = lin_red + qu_t @ k
        quad_red = quad_red + k @ Quu @ k
        V_new = Qxx + Qux.T @ K + K.T @ Qux + K.T @ Quu @ K
        v_new = qx_t + Qux.T @ k + K.T @ (qu_t + Quu @ k)
        return (V_new, v_new, lin_red, quad_red), (K, k)

    zero = jnp.zeros((), dtype=Vn.dtype)
    (V, v, lin_red, quad_red), (Ks, ks) = jax.lax.scan(
        step, (Vn, vn, zero, zero), (Jacs_x, Jacs_u, Cxx, Cuu, cx, cu),
        reverse=True, unroll=unroll,
    )
    return Ks, ks, lin_red, quad_red


# ---------------------------------------------------------------------------
# Parallel (associative-scan) linear rollout
# ---------------------------------------------------------------------------


def affine_rollout_scan(A_seq, b_seq, x0):
    """Roll ``x_{t+1} = A_t x_t + b_t`` sequentially. Returns (H+1, ds)."""

    def step(x, inp):
        A, b = inp
        x1 = A @ x + b
        return x1, x1

    _, xs = jax.lax.scan(step, x0, (A_seq, b_seq))
    return jnp.concatenate([x0[None], xs], axis=0)


def affine_rollout_parallel(A_seq, b_seq, x0):
    """Parallel-prefix rollout of an affine recursion via
    ``lax.associative_scan`` over composition of affine maps
    ``(A2,b2) ∘ (A1,b1) = (A2 A1, A2 b1 + b2)``.

    Exact for affine dynamics (LQR/ARX/Koopman rollouts and the iLQR
    forward pass on linearized dynamics); O(log H) depth instead of O(H).
    """

    def combine(f, g):
        A1, b1 = f
        A2, b2 = g
        return A2 @ A1, A2 @ b1 + b2

    # associative_scan combines along the leading axis; vmap the pairwise
    # combine over the batched prefix elements it passes in.
    As, bs = jax.lax.associative_scan(
        jax.vmap(combine), (A_seq, b_seq)
    )
    xs = jnp.einsum("tij,j->ti", As, x0) + bs
    return jnp.concatenate([x0[None], xs], axis=0)
