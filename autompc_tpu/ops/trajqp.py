"""Structured trajectory QP: block-tridiagonal KKT solve via Riccati.

This is the device-resident replacement for the IPOPT solve the
reference delegates its direct-transcription NLP to (reference:
autompc/control/nmpc.py:283-298). The KKT matrix of the knot-point QP

    min  sum_t 0.5 [dx;du]_t' H_t [dx;du]_t + g_t'[dx;du]_t  + terminal
    s.t. dx_{t+1} = A_t dx_t + B_t du_t + d_t,   dx_0 = 0

is block tridiagonal; its structured factorization *is* the
discrete-time Riccati recursion with defect terms (multiple-shooting
form, infeasible iterates allowed). One backward ``lax.scan`` factors
the KKT system, one forward ``lax.scan`` recovers the step — O(H) work,
no host callbacks (the reference re-enters Python per IPOPT inner
iteration for every objective/gradient/Jacobian evaluation,
nmpc.py:190-210).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .riccati import solve_small


def qp_backward(A_seq, B_seq, Cxx, Cuu, Cux, cx, cu, d_seq, Vf, vf, reg=1e-8):
    """Backward factorization of the trajectory QP.

    Parameters
    ----------
    A_seq : (H, ds, ds), B_seq : (H, ds, dc) dynamics linearization
    Cxx : (H, ds, ds), Cuu : (H, dc, dc), Cux : (H, dc, ds) stage Hessians
    cx : (H, ds), cu : (H, dc) stage gradients
    d_seq : (H, ds) dynamics defects f(x_t,u_t) - x_{t+1}
    Vf : (ds, ds), vf : (ds,) terminal Hessian/gradient
    reg : Levenberg regularization added to Quu

    Returns (Ks, ks) feedback gains/feedforward steps, plus (dV1, dV2)
    expected-reduction coefficients.
    """

    def step(carry, inp):
        V, v, dV1, dV2 = carry
        A, B, Qxx_c, Quu_c, Qux_c, qx_c, qu_c, d = inp
        # Value propagated through the defect: v_eff = v + V d.
        v_eff = v + V @ d
        AtV = A.T @ V
        BtV = B.T @ V
        Qxx = Qxx_c + AtV @ A
        Quu = Quu_c + BtV @ B + reg * jnp.eye(B.shape[1], dtype=B.dtype)
        Qux = Qux_c + BtV @ A
        qx = qx_c + A.T @ v_eff
        qu = qu_c + B.T @ v_eff
        K = -solve_small(Quu, Qux)
        k = -solve_small(Quu, qu)
        V_new = Qxx + Qux.T @ K + K.T @ Qux + K.T @ Quu @ K
        V_new = 0.5 * (V_new + V_new.T)
        v_new = qx + Qux.T @ k + K.T @ (qu + Quu @ k)
        dV1 = dV1 + k @ qu
        dV2 = dV2 + k @ Quu @ k
        return (V_new, v_new, dV1, dV2), (K, k)

    zero = jnp.zeros((), dtype=Vf.dtype)
    (V, v, dV1, dV2), (Ks, ks) = jax.lax.scan(
        step,
        (Vf, vf, zero, zero),
        (A_seq, B_seq, Cxx, Cuu, Cux, cx, cu, d_seq),
        reverse=True,
    )
    return Ks, ks, dV1, dV2


def qp_backward_assoc(A_seq, B_seq, Cxx, Cuu, Cux, cx, cu, d_seq, Vf, vf,
                      reg=1e-8):
    """Parallel-in-time (O(log H) depth) variant of ``qp_backward`` via
    the associative-scan Riccati — the multiple-shooting trajectory-QP
    factorization with defects is the same element algebra with the
    affine part shifted by the defect
    (ops/riccati.py:tvlqr_backward_assoc). Requires Cux = 0 (always
    true for the separable objectives make_sqp_solver builds,
    control/nmpc.py:117-118); matches ``qp_backward`` up to its
    per-step symmetrization (fp-level)."""
    del Cux  # zero by construction; the element algebra assumes it
    from .riccati import tvlqr_backward_assoc

    return tvlqr_backward_assoc(
        A_seq, B_seq, Cxx, Cuu, cx, cu, Vf, vf, d_seq=d_seq, reg=reg
    )


def qp_forward(A_seq, B_seq, d_seq, Ks, ks, alpha=1.0, dx0=None):
    """Forward recovery of the QP step: du_t = alpha k_t + K_t dx_t,
    dx_{t+1} = A dx + B du + alpha d_t. Returns (dxs[(H+1),ds], dus[H,dc])."""
    ds = A_seq.shape[1]
    if dx0 is None:
        dx0 = jnp.zeros(ds, dtype=A_seq.dtype)

    def step(dx, inp):
        A, B, d, K, k = inp
        du = alpha * k + K @ dx
        dx_next = A @ dx + B @ du + alpha * d
        return dx_next, (dx_next, du)

    _, (dxs1, dus) = jax.lax.scan(step, dx0, (A_seq, B_seq, d_seq, Ks, ks))
    dxs = jnp.concatenate([dx0[None], dxs1], axis=0)
    return dxs, dus


def solve_traj_qp(A_seq, B_seq, Cxx, Cuu, Cux, cx, cu, d_seq, Vf, vf,
                  reg=1e-8, alpha=1.0):
    """One-call structured KKT solve: returns (dxs, dus)."""
    Ks, ks, _, _ = qp_backward(
        A_seq, B_seq, Cxx, Cuu, Cux, cx, cu, d_seq, Vf, vf, reg
    )
    return qp_forward(A_seq, B_seq, d_seq, Ks, ks, alpha=alpha)
