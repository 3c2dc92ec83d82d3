"""Pallas relinearization kernel vs jacfwd and the analytic library
Jacobian (reference semantics: autompc/sysid/sindy.py:226-244 —
pred_diff_batch returns coeffs @ dTheta/dz per point)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
from autompc_tpu.ops.pallas_relin import (
    _pick_block_h,
    pallas_feature_jacobians,
)
from autompc_tpu.sysid import SINDy
from autompc_tpu.sysid.basis import FeatureLibrary


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


def jacfwd_reference(pred_core, params, xs, us, H):
    def one_traj(xs, us):
        def one(x, u):
            jx = jax.jacfwd(lambda s: pred_core(params, s, u))(x)
            ju = jax.jacfwd(lambda uu: pred_core(params, x, uu))(u)
            return jx, ju

        return jax.vmap(one)(xs[:H], us)

    return jax.vmap(one_traj)(xs, us)


def test_matches_jacfwd(model):
    rng = np.random.default_rng(0)
    B, H, ds, dc = 4, 12, 4, 1
    xs = jnp.asarray(rng.uniform(-2, 2, (B, H + 1, ds)))
    us = jnp.asarray(rng.uniform(-5, 5, (B, H, dc)))

    Jx_p, Ju_p = pallas_feature_jacobians(
        tuple(model.library._fns), xs, us, model.coeffs,
        block_b=B, interpret=True,
    )
    Jx_r, Ju_r = jacfwd_reference(
        model.pred_core, model.params, xs, us, H
    )
    np.testing.assert_allclose(
        np.asarray(Jx_p), np.asarray(Jx_r), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(Ju_p), np.asarray(Ju_r), rtol=1e-6, atol=1e-6
    )


def test_grad_terms_path_matches_jvp_path(model):
    """The sparse analytic-gradient kernel path (grad_terms) agrees
    with the jvp path and with jacfwd."""
    rng = np.random.default_rng(4)
    B, H, ds, dc = 4, 12, 4, 1
    xs = jnp.asarray(rng.uniform(-2, 2, (B, H + 1, ds)))
    us = jnp.asarray(rng.uniform(-5, 5, (B, H, dc)))
    fns = tuple(model.library._fns)
    gts = model.library.grad_terms
    assert gts is not None and len(gts) == len(fns)

    Jx_g, Ju_g = pallas_feature_jacobians(
        fns, xs, us, model.coeffs, grad_terms=gts,
        block_b=B, interpret=True,
    )
    Jx_j, Ju_j = pallas_feature_jacobians(
        fns, xs, us, model.coeffs, block_b=B, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(Jx_g), np.asarray(Jx_j), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(Ju_g), np.asarray(Ju_j), rtol=1e-6, atol=1e-6
    )
    Jx_r, Ju_r = jacfwd_reference(
        model.pred_core, model.params, xs, us, H
    )
    np.testing.assert_allclose(
        np.asarray(Jx_g), np.asarray(Jx_r), rtol=1e-6, atol=1e-6
    )


def test_grad_terms_cross_and_poly():
    """Sparse gradients for poly powers + cross terms (exercises the
    product-rule entries) against jacfwd."""
    rng = np.random.default_rng(5)
    ds, dc = 3, 2
    lib = FeatureLibrary.from_config(
        ds + dc, poly_basis=True, poly_degree=3, poly_cross_terms=True
    )
    gts = lib.grad_terms
    assert gts is not None
    coeffs = jnp.asarray(rng.normal(size=(ds, lib.n_features)) * 0.3)
    B, H = 2, 6
    xs = jnp.asarray(rng.uniform(0.2, 1.5, (B, H + 1, ds)))
    us = jnp.asarray(rng.uniform(0.2, 1.5, (B, H, dc)))

    Jx_g, Ju_g = pallas_feature_jacobians(
        tuple(lib._fns), xs, us, coeffs, grad_terms=gts,
        block_b=B, interpret=True,
    )

    def pred(x, u):
        return coeffs @ lib(jnp.concatenate([x, u]))

    def one(x, u):
        return (
            jax.jacfwd(lambda s: pred(s, u))(x),
            jax.jacfwd(lambda uu: pred(x, uu))(u),
        )

    Jx_r, Ju_r = jax.vmap(jax.vmap(one))(xs[:, :H], us)
    np.testing.assert_allclose(
        np.asarray(Jx_g), np.asarray(Jx_r), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(Ju_g), np.asarray(Ju_r), rtol=1e-5, atol=1e-6
    )


def test_feature_masking_matches_dense(model):
    """Filtering term fns/grads + slicing coefficient columns to the
    active feature set (what make_batched_ilqr_solver's feature_mask
    does before calling the kernels) reproduces the dense Jacobians
    when the masked-out columns are exactly zero."""
    rng = np.random.default_rng(6)
    B, H = 4, 10
    xs = jnp.asarray(rng.uniform(-2, 2, (B, H + 1, 4)))
    us = jnp.asarray(rng.uniform(-5, 5, (B, H, 1)))
    coeffs = np.asarray(model.coeffs)
    active = tuple(
        int(k) for k in np.flatnonzero(np.any(np.abs(coeffs) > 0, axis=0))
    )
    assert 0 < len(active) < coeffs.shape[1]
    fns = tuple(model.library._fns)
    gts = model.library.grad_terms

    dense = pallas_feature_jacobians(
        fns, xs, us, model.coeffs, grad_terms=gts,
        block_b=B, interpret=True,
    )
    fns_a = tuple(fns[k] for k in active)
    gts_a = tuple(gts[k] for k in active)
    coeffs_a = model.coeffs[:, jnp.asarray(active)]
    masked = pallas_feature_jacobians(
        fns_a, xs, us, coeffs_a, grad_terms=gts_a,
        block_b=B, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(masked[0]), np.asarray(dense[0]), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(masked[1]), np.asarray(dense[1]), rtol=1e-6, atol=1e-7
    )


def test_grad_terms_none_for_custom_terms():
    """Custom 2-tuple terms disable the sparse path."""
    lib = FeatureLibrary([("z0", lambda z: z[0])])
    assert lib.grad_terms is None


def test_matches_analytic_library_jacobian(model):
    rng = np.random.default_rng(1)
    B, H, ds = 2, 8, 4
    xs = jnp.asarray(rng.uniform(-1, 1, (B, H + 1, ds)))
    us = jnp.asarray(rng.uniform(-1, 1, (B, H, 1)))

    Jx_p, Ju_p = pallas_feature_jacobians(
        tuple(model.library._fns), xs, us, model.coeffs,
        block_b=B, interpret=True,
    )
    z = jnp.concatenate([xs[:, :H], us], axis=-1)
    Jth = model.library.jacobian(z)                    # (B, H, F, d)
    jac = jnp.einsum("bhfd,sf->bhsd", Jth, model.coeffs)
    np.testing.assert_allclose(
        np.asarray(Jx_p), np.asarray(jac[..., :ds]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(Ju_p), np.asarray(jac[..., ds:]), rtol=1e-5, atol=1e-6
    )


def test_horizon_blocking_invariance(model):
    """Different (block_h, block_b) tilings give identical results."""
    rng = np.random.default_rng(2)
    B, H = 4, 12
    xs = jnp.asarray(rng.uniform(-1, 1, (B, H + 1, 4)))
    us = jnp.asarray(rng.uniform(-1, 1, (B, H, 1)))
    fns = tuple(model.library._fns)

    ref = pallas_feature_jacobians(
        fns, xs, us, model.coeffs, block_b=B, block_h=H, interpret=True
    )
    for th in (1, 3, 4):
        out = pallas_feature_jacobians(
            fns, xs, us, model.coeffs, block_b=B, block_h=th,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(ref[0]), atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(out[1]), np.asarray(ref[1]), atol=1e-7
        )
    out = pallas_feature_jacobians(
        fns, xs, us, model.coeffs, block_b=2, block_h=6, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(ref[0]), atol=1e-7
    )


def test_multi_control_dims():
    """dc > 1 and a poly library (exercises cross-term gradients)."""
    rng = np.random.default_rng(3)
    ds, dc = 3, 2
    lib = FeatureLibrary.from_config(
        ds + dc, poly_basis=True, poly_degree=2, poly_cross_terms=True
    )
    F = lib.n_features
    coeffs = jnp.asarray(rng.normal(size=(ds, F)) * 0.3)
    B, H = 2, 6
    xs = jnp.asarray(rng.uniform(-1, 1, (B, H + 1, ds)))
    us = jnp.asarray(rng.uniform(-1, 1, (B, H, dc)))

    Jx_p, Ju_p = pallas_feature_jacobians(
        tuple(lib._fns), xs, us, coeffs, block_b=B, interpret=True
    )

    def pred(x, u):
        return coeffs @ lib(jnp.concatenate([x, u]))

    def one(x, u):
        return (
            jax.jacfwd(lambda s: pred(s, u))(x),
            jax.jacfwd(lambda uu: pred(x, uu))(u),
        )

    Jx_r, Ju_r = jax.vmap(jax.vmap(one))(xs[:, :H], us)
    np.testing.assert_allclose(
        np.asarray(Jx_p), np.asarray(Jx_r), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(Ju_p), np.asarray(Ju_r), rtol=1e-6, atol=1e-6
    )


def test_pick_block_h():
    assert _pick_block_h(200, 32) == 25
    assert _pick_block_h(200, 8) == 8
    assert _pick_block_h(7, 32) == 7
    assert _pick_block_h(13, 4) == 1


def test_per_lane_coeffs_matches_shared_calls(model):
    """coeffs (B, ds, F) per-lane mode equals B shared-coeff calls, on
    both the jvp and the sparse-analytic-gradient paths."""
    rng = np.random.default_rng(9)
    B, H, ds = 4, 8, 4
    fns = tuple(model.library._fns)
    xs = jnp.asarray(rng.uniform(-1, 1, (B, H + 1, ds)))
    us = jnp.asarray(rng.uniform(-1, 1, (B, H, 1)))
    coeffs = jnp.stack(
        [model.coeffs * (1.0 + 0.1 * i) for i in range(B)]
    )
    for gts in (None, model.library.grad_terms):
        Jx, Ju = pallas_feature_jacobians(
            fns, xs, us, coeffs, grad_terms=gts,
            block_b=B, interpret=True,
        )
        for i in range(B):
            rx, ru = pallas_feature_jacobians(
                fns, xs[i:i + 1], us[i:i + 1], coeffs[i],
                grad_terms=gts, block_b=1, interpret=True,
            )
            np.testing.assert_allclose(
                np.asarray(Jx[i]), np.asarray(rx[0]), atol=1e-12
            )
            np.testing.assert_allclose(
                np.asarray(Ju[i]), np.asarray(ru[0]), atol=1e-12
            )
