"""Pallas line-search kernel vs the scan reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
from autompc_tpu.ops.pallas_linesearch import pallas_sindy_line_search
from autompc_tpu.sysid import SINDy


@pytest.fixture(scope="module")
def model():
    b = CartpoleSwingupBenchmark()
    trajs = b.gen_trajs_batch(seed=42, n_trajs=40, traj_len=60)
    m = SINDy(
        b.system, method="lstsq", threshold=1e-3,
        trig_basis=True, trig_freq=1, trig_interaction=True,
        time_mode="discrete",
    )
    m.train(trajs)
    return m


def scan_line_search(model, x0, xs, us, Ks, ks, alphas, umin, umax):
    params = model.params
    H = us.shape[0]

    def rollout(alpha):
        def step(x, inp):
            xbar, ubar, K, k = inp
            u = jnp.clip(alpha * k + ubar + K @ (x - xbar), umin, umax)
            x1 = model.pred_core(params, x, u)
            return x1, (x1, u)

        _, (xs1, us1) = jax.lax.scan(step, x0, (xs[:H], us, Ks, ks))
        return jnp.concatenate([x0[None], xs1], axis=0), us1

    return jax.vmap(rollout)(alphas)


def test_matches_scan(model):
    rng = np.random.default_rng(0)
    B, H, ds = 4, 9, 4
    x0 = jnp.asarray(rng.uniform(-1, 1, (B, ds)))
    xs = jnp.asarray(rng.uniform(-1, 1, (B, H + 1, ds)))
    us = jnp.asarray(rng.uniform(-2, 2, (B, H, 1)))
    Ks = jnp.asarray(rng.normal(size=(B, H, 1, ds)) * 0.3)
    ks = jnp.asarray(rng.normal(size=(B, H, 1)))
    alphas = 0.2 ** jnp.arange(5, dtype=x0.dtype)

    ls_xs, ls_us = pallas_sindy_line_search(
        tuple(model.library._fns), x0, xs, us, Ks, ks,
        model.coeffs, alphas, -20.0, 20.0,
        block_b=B, interpret=True,
    )
    for b_ in range(B):
        ref_xs, ref_us = scan_line_search(
            model, x0[b_], xs[b_], us[b_], Ks[b_][:, 0, :],
            ks[b_], alphas, -20.0, 20.0,
        )
        np.testing.assert_allclose(
            np.asarray(ls_xs[b_]), np.asarray(ref_xs), rtol=1e-8, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(ls_us[b_]), np.asarray(ref_us),
            rtol=1e-8, atol=1e-10,
        )


def test_multi_control_matches_scan():
    """dc>1: SINDy on a random 3-state/2-control linear system; the
    kernel's per-component feedback/clip matches the scan path."""
    import autompc_tpu as ampc
    from autompc_tpu.core.trajectory import Trajectory

    rng = np.random.default_rng(3)
    n, m = 3, 2
    system = ampc.System(
        [f"x{i}" for i in range(n)], [f"u{j}" for j in range(m)], dt=0.1
    )
    A = np.eye(n) + 0.1 * rng.normal(size=(n, n)) / np.sqrt(n)
    A *= 0.95 / max(1.0, np.max(np.abs(np.linalg.eigvals(A))))
    Bm = 0.2 * rng.normal(size=(n, m))
    trajs = []
    for _ in range(20):
        T = 40
        obs = np.zeros((T, n))
        ctrls = rng.uniform(-2, 2, (T, m))
        obs[0] = rng.uniform(-1, 1, n)
        for t in range(T - 1):
            obs[t + 1] = A @ obs[t] + Bm @ ctrls[t]
        trajs.append(Trajectory(system, T, jnp.asarray(obs), jnp.asarray(ctrls)))

    m_sindy = SINDy(system, method="lstsq", threshold=1e-6,
                    time_mode="discrete")
    m_sindy.train(trajs)

    B, H = 4, 7
    x0 = jnp.asarray(rng.uniform(-1, 1, (B, n)))
    xs = jnp.asarray(rng.uniform(-1, 1, (B, H + 1, n)))
    us = jnp.asarray(rng.uniform(-2, 2, (B, H, m)))
    Ks = jnp.asarray(rng.normal(size=(B, H, m, n)) * 0.3)
    ks = jnp.asarray(rng.normal(size=(B, H, m)))
    alphas = 0.2 ** jnp.arange(4, dtype=x0.dtype)
    umin = -1.5 * jnp.ones(m)
    umax = 1.5 * jnp.ones(m)

    ls_xs, ls_us = pallas_sindy_line_search(
        tuple(m_sindy.library._fns), x0, xs, us, Ks, ks,
        m_sindy.coeffs, alphas, umin, umax,
        block_b=B, block_l=2, interpret=True,
    )
    assert ls_xs.shape == (B, 4, H + 1, n)
    assert ls_us.shape == (B, 4, H, m)
    # Single alpha-block layout (block_l == L, the bench default) is
    # bitwise identical to the 2-alpha blocking.
    ls_xs1, ls_us1 = pallas_sindy_line_search(
        tuple(m_sindy.library._fns), x0, xs, us, Ks, ks,
        m_sindy.coeffs, alphas, umin, umax,
        block_b=B, block_l=4, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ls_xs1), np.asarray(ls_xs))
    np.testing.assert_array_equal(np.asarray(ls_us1), np.asarray(ls_us))

    params = m_sindy.params

    def rollout(b_, alpha):
        def step(x, inp):
            xbar, ubar, K, k = inp
            u = jnp.clip(alpha * k + ubar + K @ (x - xbar), umin, umax)
            x1 = m_sindy.pred_core(params, x, u)
            return x1, (x1, u)

        _, (xs1, us1) = jax.lax.scan(
            step, x0[b_], (xs[b_, :H], us[b_], Ks[b_], ks[b_])
        )
        return jnp.concatenate([x0[b_][None], xs1], axis=0), us1

    for b_ in range(B):
        for a_ in range(4):
            ref_xs, ref_us = rollout(b_, alphas[a_])
            np.testing.assert_allclose(
                np.asarray(ls_xs[b_, a_]), np.asarray(ref_xs),
                rtol=1e-6, atol=1e-8,
            )
            np.testing.assert_allclose(
                np.asarray(ls_us[b_, a_]), np.asarray(ref_us),
                rtol=1e-6, atol=1e-8,
            )


class TestFusedLineSearch:
    """pallas_fused_line_search vs the unfused reference composition
    (rollout kernel + XLA objective + acceptance selection)."""

    def _reference(self, model, cost_mats, x0, xs, us, Ks, ks, alphas,
                   umin, umax, dt, obj0, lin_red, quad_red, ks_small,
                   thresh=0.3):
        Q, R, F, goal = cost_mats
        B, Hp1, ds = xs.shape
        H = Hp1 - 1
        L = alphas.shape[0]
        params = model.params

        def rollout(b_, alpha):
            def step(x, inp):
                xbar, ubar, K, k = inp
                u = jnp.clip(alpha * k + ubar + K @ (x - xbar), umin, umax)
                x1 = model.pred_core(params, x, u)
                return x1, (x1, u)

            _, (xs1, us1) = jax.lax.scan(
                step, x0[b_], (xs[b_, :H], us[b_], Ks[b_], ks[b_])
            )
            return jnp.concatenate([x0[b_][None], xs1], axis=0), us1

        def eval_obj(xs_, us_):
            dx = xs_[:H] - goal
            oc = jnp.einsum("ti,ij,tj->", dx, Q, dx)
            cc = jnp.einsum("tj,jk,tk->", us_, R, us_)
            dxT = xs_[H] - goal
            return dt * (oc + cc) + dxT @ F @ dxT

        out = []
        for b_ in range(B):
            objs = np.array([
                float(eval_obj(*rollout(b_, alphas[l]))) for l in range(L)
            ])
            expect = np.asarray(alphas) * lin_red[b_] + (
                np.asarray(alphas) ** 2
            ) * quad_red[b_] / 2
            denom = -expect
            ratios = np.where(
                np.abs(denom) > 1e-30, (obj0[b_] - objs) / denom, -np.inf
            )
            accept = ratios > thresh
            any_acc = accept.any()
            first_acc = int(np.argmax(accept))
            chosen = (
                0 if ks_small[b_]
                else (first_acc if any_acc else int(np.argmin(objs)))
            )
            best_obj = objs[chosen]
            ls_success = (best_obj < obj0[b_]) or bool(ks_small[b_])
            idx_last = (
                0 if ks_small[b_] else (first_acc if any_acc else L - 1)
            )
            last_obj = objs[idx_last]
            failed = (not ls_success) and (last_obj > obj0[b_] + 1e-3)
            sel = chosen if ls_success else idx_last
            new_obj = best_obj if ls_success else last_obj
            ref_xs, ref_us = rollout(b_, alphas[sel])
            out.append((ref_xs, ref_us, new_obj, ls_success, failed))
        return out

    def test_matches_reference_composition(self, model):
        rng = np.random.default_rng(7)
        B, H, ds = 4, 9, 4
        x0 = jnp.asarray(rng.uniform(-1, 1, (B, ds)))
        xs = jnp.asarray(rng.uniform(-1, 1, (B, H + 1, ds)))
        us = jnp.asarray(rng.uniform(-2, 2, (B, H, 1)))
        Ks = jnp.asarray(rng.normal(size=(B, H, 1, ds)) * 0.3)
        ks = jnp.asarray(rng.normal(size=(B, H, 1)))
        alphas = 0.2 ** jnp.arange(5, dtype=x0.dtype)
        Q = jnp.diag(jnp.array([10.0, 0.1, 0.01, 0.01]))
        R = 0.001 * jnp.eye(1)
        F = jnp.diag(jnp.array([10.0, 0.1, 0.01, 0.01]))
        goal = jnp.zeros(4)
        dt = 0.05
        # Mix of plausible solver states: some lanes mid-descent, one
        # ks-small lane, spreads of expected reductions.
        obj0 = jnp.asarray(rng.uniform(5.0, 50.0, (B,)))
        lin_red = jnp.asarray(-rng.uniform(0.1, 5.0, (B,)))
        quad_red = jnp.asarray(-rng.uniform(0.1, 5.0, (B,)))
        ks_small = jnp.array([False, True, False, False])

        from autompc_tpu.ops.pallas_linesearch import (
            pallas_fused_line_search,
        )

        new_xs, new_us, new_obj, succ, failed = pallas_fused_line_search(
            tuple(model.library._fns), x0, xs, us, Ks, ks,
            model.coeffs, alphas, -20.0, 20.0,
            Q, R, F, goal, dt, obj0, lin_red, quad_red, ks_small,
            block_b=B, interpret=True,
        )
        ref = self._reference(
            model, (np.asarray(Q), np.asarray(R), np.asarray(F),
                    np.asarray(goal)),
            x0, xs, us, Ks, ks, np.asarray(alphas), -20.0, 20.0, dt,
            np.asarray(obj0), np.asarray(lin_red), np.asarray(quad_red),
            np.asarray(ks_small),
        )
        for b_, (ref_xs, ref_us, ref_obj, ref_succ, ref_failed) in enumerate(ref):
            assert bool(succ[b_]) == ref_succ, b_
            assert bool(failed[b_]) == ref_failed, b_
            np.testing.assert_allclose(
                float(new_obj[b_]), ref_obj, rtol=1e-5, atol=1e-7
            )
            np.testing.assert_allclose(
                np.asarray(new_xs[b_]), np.asarray(ref_xs),
                rtol=1e-6, atol=1e-8,
            )
            np.testing.assert_allclose(
                np.asarray(new_us[b_]), np.asarray(ref_us),
                rtol=1e-6, atol=1e-8,
            )


def test_multi_block(model):
    rng = np.random.default_rng(1)
    B, H, ds = 8, 5, 4
    x0 = jnp.asarray(rng.uniform(-1, 1, (B, ds)))
    xs = jnp.zeros((B, H + 1, ds))
    us = jnp.zeros((B, H, 1))
    Ks = jnp.zeros((B, H, 1, ds))
    ks = jnp.asarray(rng.normal(size=(B, H, 1)))
    alphas = jnp.array([1.0, 0.5])
    ls_xs, ls_us = pallas_sindy_line_search(
        tuple(model.library._fns), x0, xs, us, Ks, ks,
        model.coeffs, alphas, -20.0, 20.0,
        block_b=4, interpret=True,
    )
    assert ls_xs.shape == (B, 2, H + 1, ds)
    assert np.isfinite(np.asarray(ls_xs)).all()


def test_per_lane_coeffs_matches_shared_calls(model):
    """coeffs (B, ds, F) — the joint fan-out's one-model-per-lane mode —
    must equal B separate shared-coeff kernel calls."""
    rng = np.random.default_rng(5)
    B, H, ds = 4, 6, 4
    fns = tuple(model.library._fns)
    x0 = jnp.asarray(rng.uniform(-1, 1, (B, ds)))
    xs = jnp.asarray(rng.uniform(-1, 1, (B, H + 1, ds)))
    us = jnp.asarray(rng.uniform(-1, 1, (B, H, 1)))
    Ks = jnp.asarray(rng.uniform(-0.3, 0.3, (B, H, 1, ds)))
    ks = jnp.asarray(rng.uniform(-0.3, 0.3, (B, H, 1)))
    alphas = 0.2 ** jnp.arange(4)
    # Per-lane coefficient planes: the trained model perturbed per lane.
    coeffs = jnp.stack(
        [model.coeffs * (1.0 + 0.1 * i) for i in range(B)]
    )
    out_xs, out_us = pallas_sindy_line_search(
        fns, x0, xs, us, Ks, ks, coeffs, alphas, -20.0, 20.0,
        block_b=B, interpret=True,
    )
    for i in range(B):
        ref_xs, ref_us = pallas_sindy_line_search(
            fns, x0[i:i + 1], xs[i:i + 1], us[i:i + 1], Ks[i:i + 1],
            ks[i:i + 1], coeffs[i], alphas, -20.0, 20.0,
            block_b=1, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out_xs[i]), np.asarray(ref_xs[0]), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(out_us[i]), np.asarray(ref_us[0]), atol=1e-12
        )


def test_fused_per_lane_cost_and_coeffs_matches_shared_calls(model):
    """per_lane_diag_cost=True + (B, ds, F) coeffs — the joint
    fan-out's fused configuration — must equal B separate shared-mode
    fused calls with diag() matrices."""
    from autompc_tpu.ops.pallas_linesearch import pallas_fused_line_search

    rng = np.random.default_rng(13)
    B, H, ds = 4, 7, 4
    fns = tuple(model.library._fns)
    x0 = jnp.asarray(rng.uniform(-1, 1, (B, ds)))
    xs = jnp.asarray(rng.uniform(-1, 1, (B, H + 1, ds)))
    us = jnp.asarray(rng.uniform(-2, 2, (B, H, 1)))
    Ks = jnp.asarray(rng.normal(size=(B, H, 1, ds)) * 0.3)
    ks = jnp.asarray(rng.normal(size=(B, H, 1)))
    alphas = 0.2 ** jnp.arange(5, dtype=x0.dtype)
    coeffs = jnp.stack(
        [model.coeffs * (1.0 + 0.05 * i) for i in range(B)]
    )
    Qd = jnp.asarray(rng.uniform(0.01, 10.0, (B, ds)))
    Rd = jnp.asarray(rng.uniform(1e-3, 1.0, (B, 1)))
    Fd = jnp.asarray(rng.uniform(0.01, 10.0, (B, ds)))
    goal = jnp.zeros(4)
    dt = 0.05
    obj0 = jnp.asarray(rng.uniform(5.0, 50.0, (B,)))
    lin_red = jnp.asarray(-rng.uniform(0.1, 5.0, (B,)))
    quad_red = jnp.asarray(-rng.uniform(0.1, 5.0, (B,)))
    ks_small = jnp.array([False, False, True, False])

    for gts in (None, model.library.grad_terms):
        out = pallas_fused_line_search(
            fns, x0, xs, us, Ks, ks, coeffs, alphas, -20.0, 20.0,
            Qd, Rd, Fd, goal, dt, obj0, lin_red, quad_red, ks_small,
            grad_terms=gts, block_b=B, interpret=True,
            per_lane_diag_cost=True,
        )
        for b in range(B):
            ref = pallas_fused_line_search(
                fns, x0[b:b + 1], xs[b:b + 1], us[b:b + 1],
                Ks[b:b + 1], ks[b:b + 1], coeffs[b], alphas,
                -20.0, 20.0,
                jnp.diag(Qd[b]), jnp.diag(Rd[b]), jnp.diag(Fd[b]),
                goal, dt, obj0[b:b + 1], lin_red[b:b + 1],
                quad_red[b:b + 1], ks_small[b:b + 1],
                grad_terms=gts, block_b=1, interpret=True,
            )
            for a, r in zip(out, ref):
                np.testing.assert_allclose(
                    np.asarray(a[b]).astype(float),
                    np.asarray(r[0]).astype(float),
                    rtol=1e-6, atol=1e-9,
                )


@pytest.mark.slow
def test_fused_reg_term_matches_reference(model):
    """per_lane_diag_cost + reg: the in-kernel objective adds the
    per-lane-weighted shared dense stage term
    ``regw * (x - mu)' S (x - mu)`` (the GaussRegFactory term of a
    SumCost candidate batch); pin selection + outputs against an
    explicit scan/numpy composition."""
    from autompc_tpu.ops.pallas_linesearch import pallas_fused_line_search

    rng = np.random.default_rng(17)
    B, H, ds = 4, 7, 4
    x0 = jnp.asarray(rng.uniform(-1, 1, (B, ds)))
    xs = jnp.asarray(rng.uniform(-1, 1, (B, H + 1, ds)))
    us = jnp.asarray(rng.uniform(-2, 2, (B, H, 1)))
    Ks = jnp.asarray(rng.normal(size=(B, H, 1, ds)) * 0.3)
    ks = jnp.asarray(rng.normal(size=(B, H, 1)))
    alphas = 0.2 ** jnp.arange(5, dtype=x0.dtype)
    Qd = jnp.asarray(rng.uniform(0.01, 10, (B, ds)))
    Rd = jnp.asarray(rng.uniform(1e-3, 1, (B, 1)))
    Fd = jnp.asarray(rng.uniform(0.01, 10, (B, ds)))
    goal = jnp.zeros(ds)
    A = rng.normal(size=(ds, ds))
    S = jnp.asarray(A @ A.T / ds + np.eye(ds))
    mu = jnp.asarray(rng.uniform(-0.5, 0.5, ds))
    regw = jnp.asarray(rng.uniform(0.1, 5.0, (B,)))
    dt = 0.05
    obj0 = jnp.asarray(rng.uniform(5.0, 50.0, (B,)))
    lin_red = jnp.asarray(-rng.uniform(0.1, 5.0, (B,)))
    quad_red = jnp.asarray(-rng.uniform(0.1, 5.0, (B,)))
    ks_small = jnp.array([False, False, True, False])

    new_xs, new_us, new_obj, succ, failed = pallas_fused_line_search(
        tuple(model.library._fns), x0, xs, us, Ks, ks,
        model.coeffs, alphas, -20.0, 20.0,
        Qd, Rd, Fd, goal, dt, obj0, lin_red, quad_red, ks_small,
        block_b=B, interpret=True,
        per_lane_diag_cost=True,
        reg=(S, mu, regw),
    )

    params = model.params

    def rollout(b_, alpha):
        def step(x, inp):
            xbar, ubar, K, k = inp
            u = jnp.clip(alpha * k + ubar + K @ (x - xbar), -20.0, 20.0)
            x1 = model.pred_core(params, x, u)
            return x1, (x1, u)

        _, (xs1, us1) = jax.lax.scan(
            step, x0[b_], (xs[b_, :H], us[b_], Ks[b_], ks[b_])
        )
        return jnp.concatenate([x0[b_][None], xs1], axis=0), us1

    def eval_obj(b_, xs_, us_):
        dx = xs_[:H] - goal
        oc = jnp.sum(dx * dx * Qd[b_][None, :])
        cc = jnp.sum(us_ * us_ * Rd[b_][None, :])
        dxm = xs_[:H] - mu
        oc = oc + regw[b_] * jnp.sum(dxm * (dxm @ S))
        dxT = xs_[H] - goal
        return dt * (oc + cc) + jnp.sum(dxT * dxT * Fd[b_])

    L = alphas.shape[0]
    for b_ in range(B):
        objs = np.array([
            float(eval_obj(b_, *rollout(b_, alphas[l]))) for l in range(L)
        ])
        expect = np.asarray(alphas) * float(lin_red[b_]) + (
            np.asarray(alphas) ** 2
        ) * float(quad_red[b_]) / 2
        ratios = np.where(
            np.abs(expect) > 1e-30, (float(obj0[b_]) - objs) / -expect,
            -np.inf,
        )
        accept = ratios > 0.3
        chosen = (
            0 if bool(ks_small[b_])
            else (int(np.argmax(accept)) if accept.any()
                  else int(np.argmin(objs)))
        )
        best_obj = objs[chosen]
        ls_success = (best_obj < float(obj0[b_])) or bool(ks_small[b_])
        idx_last = (
            0 if bool(ks_small[b_])
            else (int(np.argmax(accept)) if accept.any() else L - 1)
        )
        ref_failed = (not ls_success) and (
            objs[idx_last] > float(obj0[b_]) + 1e-3
        )
        sel = chosen if ls_success else idx_last
        ref_obj = best_obj if ls_success else objs[idx_last]
        ref_xs, ref_us = rollout(b_, alphas[sel])
        assert bool(succ[b_]) == ls_success, b_
        assert bool(failed[b_]) == ref_failed, b_
        np.testing.assert_allclose(
            float(new_obj[b_]), ref_obj, rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(new_xs[b_]), np.asarray(ref_xs),
            rtol=1e-6, atol=1e-8,
        )
        np.testing.assert_allclose(
            np.asarray(new_us[b_]), np.asarray(ref_us),
            rtol=1e-6, atol=1e-8,
        )


def test_acceptance_knife_edge_band(model):
    """Pin the acceptance-ratio knife edge (PERF.md: the fused
    kernel's SEQUENTIAL in-horizon objective vs XLA's tree reduction
    flips converged flags on some lanes at H=200 while median error is
    identical). This test asserts the invariant that keeps that
    benign: at long horizon, the fused kernel's objective stays within
    f32 summation-order noise of a float64 ground truth, so acceptance
    can only flip on lanes whose ratio sits within that noise band of
    the threshold — a future kernel change that biases the objective
    (not just reorders the sum) fails here."""
    rng = np.random.default_rng(21)
    B, H, ds = 8, 200, 4
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, ds)))
    xs = jnp.asarray(rng.uniform(-0.5, 0.5, (B, H + 1, ds)))
    us = jnp.asarray(rng.uniform(-1, 1, (B, H, 1)))
    Ks = jnp.asarray(rng.normal(size=(B, H, 1, ds)) * 0.05)
    ks = jnp.asarray(rng.normal(size=(B, H, 1)) * 0.1)
    alphas = jnp.asarray([1.0, 0.2])
    Q = jnp.diag(jnp.array([10.0, 0.1, 0.01, 0.01]))
    R = 0.001 * jnp.eye(1)
    goal = jnp.zeros(ds)
    dt = 0.05
    obj0 = jnp.asarray(rng.uniform(50.0, 200.0, (B,)))
    lin_red = jnp.asarray(-rng.uniform(0.5, 5.0, (B,)))
    quad_red = jnp.asarray(-rng.uniform(0.5, 5.0, (B,)))
    ks_small = jnp.zeros((B,), dtype=bool)
    threshold = 0.3

    from autompc_tpu.ops.pallas_linesearch import pallas_fused_line_search

    new_xs, new_us, new_obj, succ, failed = pallas_fused_line_search(
        tuple(model.library._fns), x0, xs, us, Ks, ks,
        model.coeffs, alphas, -20.0, 20.0,
        Q, R, Q, goal, dt, obj0, lin_red, quad_red, ks_small,
        ls_cost_threshold=threshold, block_b=B, interpret=True,
    )

    # float64 ground-truth objective of the returned trajectory.
    xs64 = np.asarray(new_xs, np.float64)
    us64 = np.asarray(new_us, np.float64)
    Q64, R64 = np.asarray(Q, np.float64), np.asarray(R, np.float64)
    stage = np.einsum("bhi,ij,bhj->b", xs64[:, :H], Q64, xs64[:, :H])
    ctrl = np.einsum("bhi,ij,bhj->b", us64, R64, us64)
    term = np.einsum("bi,ij,bj->b", xs64[:, H], Q64, xs64[:, H])
    obj64 = dt * (stage + ctrl) + term

    # (a) the in-kernel objective is unbiased: within f32
    # summation-order noise of the f64 truth at H=200.
    rel = np.abs(np.asarray(new_obj, np.float64) - obj64) / np.abs(obj64)
    assert rel.max() < 5e-6, rel.max()

    # (b) acceptance can flip ONLY in the noise band: recompute the
    # acceptance ratio from the f64 objective; lanes whose f64 verdict
    # disagrees with the kernel's must sit within the band.
    for b_ in range(B):
        expect = np.asarray(alphas)[:, None] * float(lin_red[b_]) + (
            np.asarray(alphas)[:, None] ** 2
        ) * float(quad_red[b_]) / 2.0
        # The kernel returns the SELECTED trajectory; check its ratio.
        ratio64 = (float(obj0[b_]) - obj64[b_]) / float(-expect[0, 0])
        kernel_acc = bool(succ[b_])
        f64_acc = bool(ratio64 > threshold) or bool(
            obj64[b_] < float(obj0[b_])
        )
        if kernel_acc != f64_acc:
            assert abs(ratio64 - threshold) < 1e-4, (
                b_, ratio64, kernel_acc, f64_acc
            )
