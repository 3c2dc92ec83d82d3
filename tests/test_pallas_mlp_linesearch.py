"""MLP line-search kernel (ops/pallas_mlp_linesearch.py) parity vs the
XLA-scan line search it replaces (control/ilqr.py line_search_one) —
interpret mode on CPU; real-hardware numbers live in PERF.md."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autompc_tpu.benchmarks import HalfcheetahBenchmark
from autompc_tpu.ops.pallas_mlp_linesearch import (
    fold_mlp_params,
    pallas_mlp_line_search,
)
from autompc_tpu.sysid import MLP

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    hc = HalfcheetahBenchmark()
    trajs = hc.gen_trajs_batch(seed=0, n_trajs=6, traj_len=20)
    model = MLP(hc.system, n_hidden_layers=2, hidden_size=16,
                n_train_iters=3, n_batch=32)
    model.train(trajs)
    return hc, model


def _reference_ls(model, params, x0s, xs, us, Ks, ks, alphas, umin, umax):
    def clip_u(u):
        return jnp.clip(u, umin, umax)

    H = us.shape[1]

    def one(x0, xs_l, us_l, Ks_l, ks_l):
        def rollout(alpha):
            def step(x, inp):
                xbar, ubar, K, k = inp
                u = clip_u(alpha * k + ubar + K @ (x - xbar))
                x1 = model.pred_core(params, x, u)
                return x1, (x1, u)

            _, (xs1, us1) = jax.lax.scan(
                step, x0, (xs_l[:H], us_l, Ks_l, ks_l)
            )
            return jnp.concatenate([x0[None], xs1], axis=0), us1

        return jax.vmap(rollout)(alphas)

    return jax.vmap(one)(x0s, xs, us, Ks, ks)


def test_fold_mlp_params_matches_pred_core(setup):
    hc, model = setup
    params = model.params
    layers = fold_mlp_params(params, model.nonlintype)
    from autompc_tpu.sysid.mlp import net_apply

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=18))
    u = jnp.asarray(rng.normal(size=6))
    plain = [{"W": W, "b": b} for W, b in layers]
    got = x + net_apply(plain, jnp.concatenate([x, u]), model.nonlintype)
    want = model.pred_core(params, x, u)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-8
    )


def test_kernel_matches_scan_line_search(setup):
    hc, model = setup
    params = model.params
    B, H, ds, dc, L = 4, 7, 18, 6, 5
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(rng.uniform(-0.1, 0.1, (B, ds)))
    xs = jnp.asarray(rng.uniform(-0.2, 0.2, (B, H + 1, ds)))
    us = jnp.asarray(rng.uniform(-0.5, 0.5, (B, H, dc)))
    Ks = jnp.asarray(rng.uniform(-0.3, 0.3, (B, H, dc, ds)))
    ks = jnp.asarray(rng.uniform(-0.5, 0.5, (B, H, dc)))
    alphas = 0.2 ** jnp.arange(L, dtype=xs.dtype)
    bounds = hc.task.get_ctrl_bounds()
    umin, umax = bounds[:, 0], bounds[:, 1]

    layers = fold_mlp_params(params, model.nonlintype)
    got_xs, got_us = pallas_mlp_line_search(
        layers, model.nonlintype, x0s, xs, us, Ks, ks, alphas,
        umin, umax, block_b=B, interpret=True,
    )
    want_xs, want_us = _reference_ls(
        model, params, x0s, xs, us, Ks, ks, alphas, umin, umax
    )
    np.testing.assert_allclose(
        np.asarray(got_us), np.asarray(want_us), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(got_xs), np.asarray(want_xs), rtol=1e-6, atol=1e-7
    )


def test_solver_mlp_ls_path_matches_default(setup):
    """make_batched_ilqr_solver(mlp_ls=...) == the vmapped-scan solver
    end to end (interpret-mode kernel on CPU)."""
    from autompc_tpu.control.ilqr import make_batched_ilqr_solver
    from autompc_tpu.costs import QuadCost

    hc, model = setup
    cost = QuadCost(
        hc.system, jnp.eye(18), 0.01 * jnp.eye(6), jnp.eye(18),
        goal=jnp.zeros(18),
    )
    b = hc.task.get_ctrl_bounds()
    B, H = 4, 6
    kw = dict(
        H=H, ds=18, dc=6, obsdim=18, dt=hc.system.dt,
        ubounds=(b[:, 0], b[:, 1]), max_iter=6,
        pred_diff=model.pred_diff_core, backward="scan",
    )
    base = jax.jit(make_batched_ilqr_solver(model.pred_core, cost, **kw))
    kern = jax.jit(make_batched_ilqr_solver(
        model.pred_core, cost,
        mlp_ls=dict(nonlin=model.nonlintype, interpret=True), **kw,
    ))
    rng = np.random.default_rng(2)
    x0s = jnp.asarray(rng.uniform(-0.1, 0.1, (B, 18)))
    ug = jnp.zeros((B, H, 6))
    cb, xb, ub, _, _ = base(model.params, x0s, ug)
    ck, xk, uk, _, _ = kern(model.params, x0s, ug)
    np.testing.assert_allclose(
        np.asarray(uk), np.asarray(ub), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(xk), np.asarray(xb), rtol=1e-5, atol=1e-6
    )


def test_feat_layout_matches_scan_line_search(setup):
    """The dense MXU layout (lanes = batch, transposed-weight
    dot_generals; VERDICT r3 item 1) matches the scan line search."""
    hc, model = setup
    params = model.params
    B, H, ds, dc, L = 4, 7, 18, 6, 5
    rng = np.random.default_rng(7)
    x0s = jnp.asarray(rng.uniform(-0.1, 0.1, (B, ds)))
    xs = jnp.asarray(rng.uniform(-0.2, 0.2, (B, H + 1, ds)))
    us = jnp.asarray(rng.uniform(-0.5, 0.5, (B, H, dc)))
    Ks = jnp.asarray(rng.uniform(-0.3, 0.3, (B, H, dc, ds)))
    ks = jnp.asarray(rng.uniform(-0.5, 0.5, (B, H, dc)))
    alphas = 0.2 ** jnp.arange(L, dtype=xs.dtype)
    bounds = hc.task.get_ctrl_bounds()
    umin, umax = bounds[:, 0], bounds[:, 1]

    layers = fold_mlp_params(params, model.nonlintype)
    want_xs, want_us = _reference_ls(
        model, params, x0s, xs, us, Ks, ks, alphas, umin, umax
    )
    # bf16x3 emulates f32 (~2 bf16 mantissas ~= 16 bits); against the
    # x64 reference the 7-step recursion lands at ~1e-3 max rel on a
    # handful of small elements — three decades tighter than plain
    # bf16 (~1e-0..1e-2 here). Convergence-grade accuracy is judged by
    # the TPU A/B (tools/ab_cheetah_ls.py), not this tolerance.
    for precision, rtol, atol in (
        ("highest", 1e-6, 1e-8), ("bf16x3", 2e-3, 1e-4),
    ):
        got_xs, got_us = pallas_mlp_line_search(
            layers, model.nonlintype, x0s, xs, us, Ks, ks, alphas,
            umin, umax, block_b=B, interpret=True, layout="feat",
            precision=precision,
        )
        np.testing.assert_allclose(
            np.asarray(got_us), np.asarray(want_us), rtol=rtol, atol=atol
        )
        np.testing.assert_allclose(
            np.asarray(got_xs), np.asarray(want_xs), rtol=rtol,
            atol=max(atol, 1e-7)
        )


def test_mxu_layout_matches_scan_line_search(setup):
    hc, model = setup
    params = model.params
    B, H, ds, dc, L = 4, 7, 18, 6, 5
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(rng.uniform(-0.1, 0.1, (B, ds)))
    xs = jnp.asarray(rng.uniform(-0.2, 0.2, (B, H + 1, ds)))
    us = jnp.asarray(rng.uniform(-0.5, 0.5, (B, H, dc)))
    Ks = jnp.asarray(rng.uniform(-0.3, 0.3, (B, H, dc, ds)))
    ks = jnp.asarray(rng.uniform(-0.5, 0.5, (B, H, dc)))
    alphas = 0.2 ** jnp.arange(L, dtype=xs.dtype)
    bounds = hc.task.get_ctrl_bounds()
    umin, umax = bounds[:, 0], bounds[:, 1]

    layers = fold_mlp_params(params, model.nonlintype)
    got_xs, got_us = pallas_mlp_line_search(
        layers, model.nonlintype, x0s, xs, us, Ks, ks, alphas,
        umin, umax, block_b=B, interpret=True, layout="mxu",
    )
    want_xs, want_us = _reference_ls(
        model, params, x0s, xs, us, Ks, ks, alphas, umin, umax
    )
    np.testing.assert_allclose(
        np.asarray(got_us), np.asarray(want_us), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(got_xs), np.asarray(want_xs), rtol=1e-6, atol=1e-7
    )
