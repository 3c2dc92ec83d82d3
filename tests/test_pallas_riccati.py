"""Pallas Riccati backward-pass kernel vs the scan reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autompc_tpu.ops.pallas_riccati import pallas_tvlqr_backward
from autompc_tpu.ops.riccati import tvlqr_backward_scan


def make_problem(B, H, ds, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    Jx = jnp.asarray(rng.normal(size=(B, H, ds, ds)) * 0.3, dtype)
    Ju = jnp.asarray(rng.normal(size=(B, H, ds, 1)), dtype)
    Cxx = jnp.asarray(
        np.broadcast_to(np.eye(ds), (B, H, ds, ds)).copy(), dtype
    )
    Cuu = jnp.asarray(np.full((B, H, 1, 1), 0.5), dtype)
    cx = jnp.asarray(rng.normal(size=(B, H, ds)), dtype)
    cu = jnp.asarray(rng.normal(size=(B, H, 1)), dtype)
    Vn = jnp.asarray(np.broadcast_to(2 * np.eye(ds), (B, ds, ds)).copy(), dtype)
    vn = jnp.asarray(rng.normal(size=(B, ds)), dtype)
    return Jx, Ju, Cxx, Cuu, cx, cu, Vn, vn


@pytest.mark.parametrize("ds,H,B", [(4, 12, 8), (5, 20, 16), (2, 7, 4)])
def test_matches_scan(ds, H, B):
    args = make_problem(B, H, ds, seed=ds, dtype=jnp.float64)
    Ks_p, ks_p, lin_p, quad_p = pallas_tvlqr_backward(
        *args, block_b=B, interpret=True
    )
    Ks_s, ks_s, lin_s, quad_s = jax.vmap(tvlqr_backward_scan)(*args)
    np.testing.assert_allclose(np.asarray(Ks_p), np.asarray(Ks_s), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(ks_p), np.asarray(ks_s), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(lin_p), np.asarray(lin_s), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(quad_p), np.asarray(quad_s), rtol=1e-9)


def test_multi_block_grid():
    args = make_problem(32, 10, 3, seed=7, dtype=jnp.float64)
    Ks_p, ks_p, lin_p, quad_p = pallas_tvlqr_backward(
        *args, block_b=8, interpret=True
    )
    Ks_s, ks_s, lin_s, quad_s = jax.vmap(tvlqr_backward_scan)(*args)
    np.testing.assert_allclose(np.asarray(Ks_p), np.asarray(Ks_s), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(quad_p), np.asarray(quad_s), rtol=1e-9)


def test_rejects_multi_ctrl():
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError):
        pallas_tvlqr_backward(
            jnp.zeros((4, 5, 3, 3)), jnp.zeros((4, 5, 3, 2)),
            jnp.zeros((4, 5, 3, 3)), jnp.zeros((4, 5, 2, 2)),
            jnp.zeros((4, 5, 3)), jnp.zeros((4, 5, 2)),
            jnp.zeros((4, 3, 3)), jnp.zeros((4, 3)),
            interpret=True,
        )
