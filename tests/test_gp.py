"""Approximate GP (SVGP) model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import autompc_tpu as ampc
from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
from autompc_tpu.sysid import ApproximateGPModel, ApproximateGPModelFactory


@pytest.fixture(scope="module")
def benchmark():
    return CartpoleSwingupBenchmark()


@pytest.fixture(scope="module")
def trained_gp(benchmark):
    trajs = benchmark.gen_trajs_batch(seed=42, n_trajs=30, traj_len=50)
    model = ApproximateGPModel(
        benchmark.system, niter=8, lr=0.05, batch_size=256, induce_count=64
    )
    model.train(trajs)
    return model


class TestApproximateGP:
    def test_elbo_improves(self, trained_gp):
        losses = np.asarray(trained_gp._losses)
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()

    def test_holdout_accuracy(self, benchmark, trained_gp):
        holdout = benchmark.gen_trajs_batch(seed=5, n_trajs=2, traj_len=40)[0]
        preds = trained_gp.pred_batch(holdout.obs[:-1], holdout.ctrls[:-1])
        errs = np.asarray(preds) - np.asarray(holdout.obs[1:])
        deltas = np.abs(np.diff(np.asarray(holdout.obs), axis=0))
        assert np.abs(errs).mean() < 0.5 * deltas.mean()

    def test_pred_diff_shapes(self, trained_gp):
        s = jnp.array([0.1, 0.0, 0.2, 0.0])
        u = jnp.array([1.0])
        pred, jx, ju = trained_gp.pred_diff(s, u)
        assert pred.shape == (4,)
        assert jx.shape == (4, 4)
        assert ju.shape == (4, 1)
        assert np.isfinite(np.asarray(jx)).all()

    def test_sampling(self, trained_gp):
        s = jnp.array([0.1, 0.0, 0.2, 0.0])
        u = jnp.array([1.0])
        key = jax.random.PRNGKey(0)
        s1 = trained_gp.sample(s, u, key=key)
        s2 = trained_gp.sample(s, u, key=key)
        s3 = trained_gp.sample(s, u, key=jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))
        assert not np.allclose(np.asarray(s1), np.asarray(s3))
        # samples distribute around the mean prediction
        mean = np.asarray(trained_gp.pred(s, u))
        keys = jax.random.split(jax.random.PRNGKey(2), 64)
        draws = np.stack(
            [np.asarray(trained_gp.sample(s, u, key=k)) for k in keys]
        )
        np.testing.assert_allclose(draws.mean(axis=0), mean, atol=0.2)

    def test_sample_parallel(self, trained_gp):
        states = jnp.zeros((8, 4))
        ctrls = jnp.ones((8, 1))
        out = trained_gp.sample_parallel(states, ctrls, key=jax.random.PRNGKey(3))
        assert out.shape == (8, 4)

    def test_get_sampler_frozen_draw(self, trained_gp):
        sampler = trained_gp.get_sampler(key=jax.random.PRNGKey(4))
        s = jnp.array([0.1, 0.0, 0.2, 0.0])
        u = jnp.array([1.0])
        np.testing.assert_allclose(
            np.asarray(sampler(s, u)), np.asarray(sampler(s, u))
        )

    def test_parameters_roundtrip(self, benchmark, trained_gp):
        m2 = ApproximateGPModel(benchmark.system, induce_count=64)
        m2.set_parameters(trained_gp.get_parameters())
        s = jnp.array([0.3, 0.1, 0.0, -0.1])
        u = jnp.array([0.5])
        np.testing.assert_allclose(
            np.asarray(trained_gp.pred(s, u)), np.asarray(m2.pred(s, u)),
            rtol=1e-6,
        )

    def test_factory(self, benchmark):
        factory = ApproximateGPModelFactory(benchmark.system)
        cs = factory.get_configuration_space()
        cfg = cs.get_default_configuration()
        assert cfg["induce_count"] == 100
        model = factory(cfg, None, skip_train_model=True)
        assert model.induce_count == 100

    def test_cached_mean_weights_match_predictive(self, trained_gp):
        """params["w"] fast path (one kernel row per task) equals the
        full whitened predictive mean (sysid/gp.py:_task_predict)."""
        import jax.numpy as jnp

        params = trained_gp.params
        slow = {k: v for k, v in params.items() if k != "w"}
        state = jnp.asarray(np.array([0.3, -0.2, 0.1, 0.4]))
        ctrl = jnp.asarray(np.array([0.5]))
        fast = trained_gp.pred_core(params, state, ctrl)
        full = trained_gp.pred_core(slow, state, ctrl)
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(full), rtol=1e-9, atol=1e-10
        )


class TestBucketedSVGPTraining:
    """Cross-bucket batched SVGP training (sysid/gp.py:
    train_svgp_buckets): every distinct induce_count trains in ONE
    program at a padded shape; padding must be an EXACT no-op."""

    def test_padded_training_matches_standalone(self, benchmark):
        from autompc_tpu.sysid.gp import (
            gp_pred_core_cached,
            train_svgp_buckets,
        )

        trajs = benchmark.gen_trajs_batch(seed=7, n_trajs=10, traj_len=30)
        tlist = trajs.to_list()
        Ms = [12, 20]
        params_b, w_b, norm = train_svgp_buckets(
            benchmark.system, tlist, Ms, niter=3, lr=0.05,
            batch_size=64, seed=100, pad_to=24,
        )
        rng = np.random.default_rng(0)
        states = jnp.asarray(rng.uniform(-1, 1, (16, 4)))
        ctrls = jnp.asarray(rng.uniform(-1, 1, (16, 1)))
        for k, M in enumerate(Ms):
            solo = ApproximateGPModel(
                benchmark.system, niter=3, lr=0.05, batch_size=64,
                induce_count=M, seed=100,
            )
            solo.train(tlist)
            sp = solo._params
            bp = jax.tree_util.tree_map(lambda a: a[k], params_b)
            # Real parameter rows must match the standalone training
            # trajectory (same init, same PRNG chain, exact-zero
            # padding gradients).
            np.testing.assert_allclose(
                np.asarray(bp["Z"][:, :M]), np.asarray(sp["Z"]),
                rtol=1e-7, atol=1e-9,
            )
            np.testing.assert_allclose(
                np.asarray(bp["m"][:, :M]), np.asarray(sp["m"]),
                rtol=1e-7, atol=1e-9,
            )
            np.testing.assert_allclose(
                np.asarray(bp["Ls"][:, :M, :M]), np.asarray(sp["Ls"]),
                rtol=1e-7, atol=1e-9,
            )
            for key in ("log_lengthscale", "log_outputscale",
                        "log_noise", "mean_const"):
                np.testing.assert_allclose(
                    np.asarray(bp[key]), np.asarray(sp[key]),
                    rtol=1e-7, atol=1e-9, err_msg=key,
                )
            # Dummy rows must be exact no-ops in the cached predictor.
            lane_params = {"gp": bp, "w": w_b[k], **norm}
            got = jax.vmap(
                lambda s, u: gp_pred_core_cached(lane_params, s, u)
            )(states, ctrls)
            want = jax.vmap(
                lambda s, u: solo.pred_core(solo.params, s, u)
            )(states, ctrls)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-7, atol=1e-9
            )

    def test_padded_weights_are_zero_on_dummies(self, benchmark):
        from autompc_tpu.sysid.gp import train_svgp_buckets

        trajs = benchmark.gen_trajs_batch(seed=7, n_trajs=6, traj_len=20)
        params_b, w_b, _ = train_svgp_buckets(
            benchmark.system, trajs.to_list(), [8], niter=2,
            batch_size=32, pad_to=16,
        )
        np.testing.assert_allclose(np.asarray(w_b[0][:, 8:]), 0.0)
