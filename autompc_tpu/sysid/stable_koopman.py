"""Stable-Koopman solver: fit A = S^{-1} U B S with A Schur-stable.

Re-creates the reference's projected fast-gradient method (reference:
autompc/sysid/stable_koopman.py:340-494, after Mamakoukas et al.) with
device-resident linear algebra: eigendecompositions, polar factorization
(via SVD), matrix square roots, and the discrete Lyapunov solve are jnp
operations (replacing scipy polar/pinv2/solve_discrete_lyapunov/sqrtm).
The FGM restart logic runs as a bounded ``lax.while_loop``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.lstsq import pinv


def project_psd(Q, epsilon=0.0, delta=jnp.inf):
    """Project onto {PSD, eigenvalues in [epsilon, delta]}
    (stable_koopman.py:340-345)."""
    Q = (Q + Q.T) / 2
    e, V = jnp.linalg.eigh(Q)
    e = jnp.minimum(delta, jnp.maximum(e, epsilon))
    return (V * e) @ V.T


def polar(M):
    """Polar decomposition M = U P via SVD (replaces scipy polar)."""
    W, s, Vt = jnp.linalg.svd(M, full_matrices=False)
    U = W @ Vt
    P = Vt.T @ (s[:, None] * Vt)
    return U, P


def sqrtm_psd(P):
    """Symmetric PSD square root via eigendecomposition."""
    e, V = jnp.linalg.eigh(P)
    return (V * jnp.sqrt(jnp.maximum(e, 0.0))) @ V.T


def solve_discrete_lyapunov(A, Q, iters=200):
    """Solve X = A X A' + Q by squared-iteration fixed point
    (replaces scipy.linalg.solve_discrete_lyapunov for Schur-stable A)."""

    def body(_, carry):
        X, Ak = carry
        X = X + Ak @ X @ Ak.T
        Ak = Ak @ Ak
        return X, Ak

    # Doubling iteration: converges quadratically for rho(A) < 1; the
    # iteration count is log2 of the effective horizon.
    X, _ = jax.lax.fori_loop(0, 60, body, (Q, A))
    return X


def checkdstable(A):
    """(P, S, U, B) certificate factorization of a stable A
    (stable_koopman.py:364-372)."""
    n = A.shape[0]
    P = solve_discrete_lyapunov(A.T, jnp.eye(n))
    S = sqrtm_psd(P)
    invS = jnp.linalg.inv(S)
    UB = S @ A @ invS
    U, B = polar(UB)
    B = project_psd(B, 0.0, 1.0)
    return P, S, U, B


def _error_and_grads(Xs, Xu, Y, S, U, B, Bcon):
    """Frobenius error of Y - Bcon Xu - S^{-1}UBS Xs and its gradients
    (stable_koopman.py:347-362)."""
    Sinv = jnp.linalg.inv(S)
    R = Sinv @ U @ B @ S
    Err = Y - Bcon @ Xu - R @ Xs
    e = jnp.linalg.norm(Err)
    temp1 = Sinv.T @ (-Err) @ Xs.T
    S_grad = -temp1 @ R.T + B.T @ U.T @ temp1
    U_grad = temp1 @ S.T @ B.T
    B_grad = -U.T @ (-temp1) @ S.T
    Bcon_grad = -Err @ Xu.T
    return e, S_grad, U_grad, B_grad, Bcon_grad


def stabilize_discrete(Xs, Xu, Y, max_iter=30, ls_max_iter=20, ls_param=1.5):
    """Fit (A, Bcon) with A Schur-stable by FGM over the (S, U, B)
    parameterization (stable_koopman.py:374-494 semantics: doubling step
    length, projection after each trial step, FGM momentum with restart
    on line-search failure).

    Returns (A, S, U, B, Bcon, error).
    """
    n = Xs.shape[0]
    na2 = jnp.linalg.norm(Y)

    # Initialization (stable_koopman.py:383-389).
    X = jnp.concatenate([Xs, Xu], axis=0)
    temp = Y @ pinv(X)
    U0, B0 = polar(temp[:n, :n])
    B0 = project_psd(B0, 0.0, 1.0)
    Bcon0 = temp[:n, n:]
    S0 = jnp.eye(n)

    eS = jnp.linalg.eigvalsh(S0)
    L0 = (jnp.max(eS) / jnp.min(eS)) ** 2
    err0, *_ = _error_and_grads(Xs, Xu, Y, S0, U0, B0, Bcon0)

    alpha0 = 0.5

    def ls_trial(Ys, Yu, Yb, Ybc, gS, gU, gB, gBc, step):
        Sn = project_psd(Ys - gS * step, 1e-15)
        Un, _ = polar(Yu - gU * step)
        Bn = project_psd(Yb - gB * step, 0.0, 1.0)
        Bcn = Ybc - gBc * step
        e, *_ = _error_and_grads(Xs, Xu, Y, Sn, Un, Bn, Bcn)
        return Sn, Un, Bn, Bcn, e

    def body(carry):
        (S, U, B, Bcon, Ys, Yu, Yb, Ybc, error, step, alpha, restarti, i, done) = carry
        _, gS, gU, gB, gBc = _error_and_grads(Xs, Xu, Y, S, U, B, Bcon)
        step = step * 2.0

        # Backtracking line search with fixed max trials.
        def ls_body(ls_carry):
            _, _, _, _, e_next, stp, it = ls_carry
            Sn, Un, Bn, Bcn, e = ls_trial(Ys, Yu, Yb, Ybc, gS, gU, gB, gBc, stp)
            return Sn, Un, Bn, Bcn, e, stp / ls_param, it + 1

        def ls_cond(ls_carry):
            _, _, _, _, e_next, _, it = ls_carry
            return (e_next > error) & (it < ls_max_iter)

        Sn0, Un0, Bn0, Bcn0, e0 = ls_trial(Ys, Yu, Yb, Ybc, gS, gU, gB, gBc, step)
        Sn, Un, Bn, Bcn, e_next, step, inner = jax.lax.while_loop(
            ls_cond, ls_body, (Sn0, Un0, Bn0, Bcn0, e0, step / ls_param, 1)
        )

        ls_failed = e_next > error
        alpha_next = (jnp.sqrt(alpha**4 + 4 * alpha**2) - alpha**2) / 2
        beta = alpha * (1 - alpha) / (alpha**2 + alpha_next)

        def on_fail(_):
            # Restart FGM from the current iterate (stable_koopman.py:
            # 452-471); second consecutive failure terminates.
            return (
                S, U, B, Bcon, S, U, B, Bcon,
                error, 1.0 / L0, alpha0,
                jnp.array(0), restarti == 0,
            )

        def on_success(_):
            Ys2 = Sn + beta * (Sn - S)
            Yu2 = Un + beta * (Un - U)
            Yb2 = Bn + beta * (Bn - B)
            Ybc2 = Bcn + beta * (Bcn - Bcon)
            return (
                Sn, Un, Bn, Bcn, Ys2, Yu2, Yb2, Ybc2,
                e_next, step, alpha_next,
                jnp.array(1), jnp.array(False),
            )

        (S, U, B, Bcon, Ys, Yu, Yb, Ybc, error, step, alpha, restarti, stop) = (
            jax.lax.cond(ls_failed, on_fail, on_success, None)
        )
        converged = error < 1e-12 * na2
        return (S, U, B, Bcon, Ys, Yu, Yb, Ybc, error, step, alpha, restarti,
                i + 1, stop | converged)

    def cond(carry):
        i, done = carry[-2], carry[-1]
        return (i < max_iter) & ~done

    init = (
        S0, U0, B0, Bcon0, S0, U0, B0, Bcon0, err0,
        1.0 / L0, jnp.array(alpha0), jnp.array(1), jnp.array(0),
        jnp.array(False),
    )
    out = jax.lax.while_loop(cond, body, init)
    S, U, B, Bcon, error = out[0], out[1], out[2], out[3], out[8]
    A = jnp.linalg.inv(S) @ U @ B @ S
    return A, S, U, B, Bcon, error
