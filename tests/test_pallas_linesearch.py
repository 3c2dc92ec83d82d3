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
