"""Bucketed (shape-padded) ARX batch training vs the per-config path."""

import numpy as np
import pytest

from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
from autompc_tpu.evaluation import HoldoutModelEvaluator, get_model_rmse
from autompc_tpu.sysid import ARX, ARXFactory
from autompc_tpu.tuning import ModelTuner
from autompc_tpu.tuning.bucketed import ARXBucketEvaluator


@pytest.fixture(scope="module")
def data():
    b = CartpoleSwingupBenchmark()
    trajs = b.gen_trajs(seed=11, n_trajs=30, traj_len=50)
    return b, trajs


class TestARXBucketEvaluator:
    def test_matches_per_config_training(self, data):
        """Every padded candidate's holdout RMSE equals training the
        plain ARX(history=k) model and scoring it with get_model_rmse —
        the zeroed feature columns change nothing."""
        b, trajs = data
        training, holdout = trajs[:24], trajs[24:]
        bucket = ARXBucketEvaluator(
            b.system, training, holdout, kmax=6, horizon=2
        )
        ks = [1, 2, 4, 6]
        got = bucket(ks)
        for k, batched_rmse in zip(ks, got):
            model = ARX(b.system, history=k)
            model.train(training)
            expected = get_model_rmse(model, holdout, horizon=2)
            assert batched_rmse == pytest.approx(expected, rel=1e-6), k

    def test_one_program_many_batches(self, data):
        """Different k-subsets reuse the cached program (no recompile
        per candidate — just check repeated calls agree)."""
        b, trajs = data
        bucket = ARXBucketEvaluator(
            b.system, trajs[:24], trajs[24:], kmax=6, horizon=1
        )
        first = bucket([3])
        again = bucket([5, 3, 1])
        assert again[1] == pytest.approx(first[0], rel=1e-12)


class TestModelTunerBucketedPath:
    def test_tuner_costs_match_sequential(self, data):
        """ModelTuner with the bucketed path scores ARX candidates
        identically to the per-config evaluator path."""
        b, trajs = data

        def run(use_bucketed):
            rng = np.random.default_rng(9)
            evaluator = HoldoutModelEvaluator(
                system=b.system, trajs=trajs, metric="rmse", rng=rng,
                holdout_prop=0.25,
            )
            tuner = ModelTuner(
                b.system, evaluator, eval_batch=3,
                use_bucketed=use_bucketed,
            )
            tuner.add_model_factory(ARXFactory(b.system))
            model, result = tuner.run(rng, n_iters=6)
            return result

        res_seq = run(False)
        res_fast = run(True)
        assert [c.get_dictionary() for c in res_seq.cfgs] == [
            c.get_dictionary() for c in res_fast.cfgs
        ]
        for cs, cf in zip(res_seq.costs, res_fast.costs):
            assert cf == pytest.approx(cs, rel=1e-6)


class TestMLPBucketEvaluator:
    def test_matches_per_config_training(self, data):
        """Masked max-width training equals the per-config MLP train +
        holdout RMSE (same init placement, same Adam trajectory; only
        matmul reassociation differs)."""
        from autompc_tpu.evaluation import get_model_rmse
        from autompc_tpu.sysid.mlp import MLP
        from autompc_tpu.tuning.bucketed import MLPBucketEvaluator

        b, trajs = data
        training, holdout = trajs[:24], trajs[24:]
        bucket = MLPBucketEvaluator(
            b.system, training, holdout, n_hidden_layers=2,
            nonlintype="tanh", horizon=1, max_width=48,
            n_train_iters=4, n_batch=32,
        )
        widths = [[16, 24], [48, 32]]
        lrs = [1e-3, 3e-3]
        got = bucket(widths, lrs)
        for (w1, w2), lr, batched in zip(widths, lrs, got):
            model = MLP(
                b.system, n_hidden_layers=2, nonlintype="tanh",
                hidden_size_1=w1, hidden_size_2=w2, lr=lr,
                n_train_iters=4, n_batch=32,
            )
            model.train(training)
            expected = get_model_rmse(model, holdout, horizon=1)
            assert batched == pytest.approx(expected, rel=1e-5), (w1, w2)

    def test_sigmoid_masking_is_exact(self, data):
        """sigmoid(0) = 0.5 on masked units — the in-forward weight
        masks must still make the padded net equal the small net."""
        from autompc_tpu.evaluation import get_model_rmse
        from autompc_tpu.sysid.mlp import MLP
        from autompc_tpu.tuning.bucketed import MLPBucketEvaluator

        b, trajs = data
        training, holdout = trajs[:24], trajs[24:]
        bucket = MLPBucketEvaluator(
            b.system, training, holdout, n_hidden_layers=1,
            nonlintype="sigmoid", horizon=1, max_width=32,
            n_train_iters=3, n_batch=32,
        )
        got = bucket([[20]], [1e-3])
        model = MLP(
            b.system, n_hidden_layers=1, nonlintype="sigmoid",
            hidden_size_1=20, lr=1e-3, n_train_iters=3, n_batch=32,
        )
        model.train(training)
        expected = get_model_rmse(model, holdout, horizon=1)
        assert got[0] == pytest.approx(expected, rel=1e-5)


class TestModelTunerMLPBucketedPath:
    def test_tuner_costs_match_sequential(self, data):
        from autompc_tpu.sysid import MLPFactory

        b, trajs = data

        def run(use_bucketed):
            rng = np.random.default_rng(13)
            evaluator = HoldoutModelEvaluator(
                system=b.system, trajs=trajs, metric="rmse", rng=rng,
                holdout_prop=0.25,
            )
            tuner = ModelTuner(
                b.system, evaluator, eval_batch=3,
                use_bucketed=use_bucketed,
            )
            tuner.add_model_factory(
                MLPFactory(b.system, n_train_iters=3, n_batch=32)
            )
            _, result = tuner.run(rng, n_iters=3)
            return result

        res_seq = run(False)
        res_fast = run(True)
        assert [c.get_dictionary() for c in res_seq.cfgs] == [
            c.get_dictionary() for c in res_fast.cfgs
        ]
        for cs, cf in zip(res_seq.costs, res_fast.costs):
            assert cf == pytest.approx(cs, rel=1e-4)


class TestSINDyBucketEvaluator:
    @pytest.mark.parametrize("method", ["lstsq", "lasso"])
    def test_matches_per_config_training(self, data, method):
        from autompc_tpu.evaluation import get_model_rmse
        from autompc_tpu.sysid import SINDy
        from autompc_tpu.tuning.bucketed import SINDyBucketEvaluator

        b, trajs = data
        training, holdout = trajs[:24], trajs[24:]
        bucket_cfg = dict(
            method=method, time_mode="discrete",
            trig_basis="true", trig_freq=1, trig_interaction="true",
            poly_basis="false", poly_degree=3, poly_cross_terms="false",
        )
        bucket = SINDyBucketEvaluator(
            b.system, training, holdout, bucket_cfg, horizon=2
        )
        regs = [1e-3, 1e-1] if method == "lstsq" else [1e-4, 1e-2]
        got = bucket(regs)
        for reg, batched in zip(regs, got):
            kw = dict(bucket_cfg)
            if method == "lasso":
                kw["lasso_alpha"] = reg
            else:
                kw["threshold"] = reg
            model = SINDy(b.system, **kw)
            model.train(training)
            expected = get_model_rmse(model, holdout, horizon=2)
            if np.isfinite(expected):
                assert batched == pytest.approx(expected, rel=1e-6), reg
            else:
                assert not np.isfinite(batched)


class TestModelTunerMixedBucketedPath:
    def test_mixed_factories_match_sequential(self, data):
        """ARX + SINDy + MLP in one tuner: bucketed batch evaluation
        scores every candidate identically to the per-config path."""
        from autompc_tpu.sysid import MLPFactory, SINDyFactory

        b, trajs = data

        def run(use_bucketed):
            rng = np.random.default_rng(21)
            evaluator = HoldoutModelEvaluator(
                system=b.system, trajs=trajs, metric="rmse", rng=rng,
                holdout_prop=0.25,
            )
            tuner = ModelTuner(
                b.system, evaluator, eval_batch=4,
                use_bucketed=use_bucketed,
            )
            tuner.add_model_factory(ARXFactory(b.system))
            tuner.add_model_factory(SINDyFactory(b.system))
            tuner.add_model_factory(
                MLPFactory(b.system, n_train_iters=2, n_batch=32)
            )
            _, result = tuner.run(rng, n_iters=8)
            return result

        res_seq = run(False)
        res_fast = run(True)
        assert [c.get_dictionary() for c in res_seq.cfgs] == [
            c.get_dictionary() for c in res_fast.cfgs
        ]
        for cs, cf in zip(res_seq.costs, res_fast.costs):
            if np.isfinite(cs) and np.isfinite(cf):
                assert cf == pytest.approx(cs, rel=1e-4), (
                    res_seq.costs, res_fast.costs,
                )
            else:
                assert np.isinf(cs) == np.isinf(cf)


class TestKoopmanLassoBucketEvaluator:
    def test_matches_per_config_training(self, data):
        from autompc_tpu.evaluation import get_model_rmse
        from autompc_tpu.sysid import Koopman
        from autompc_tpu.tuning.bucketed import KoopmanLassoBucketEvaluator

        b, trajs = data
        training, holdout = trajs[:24], trajs[24:]
        bucket_cfg = dict(
            poly_basis="false", poly_degree=3,
            trig_basis="true", trig_freq=1, product_terms="false",
        )
        bucket = KoopmanLassoBucketEvaluator(
            b.system, training, holdout, bucket_cfg, horizon=2
        )
        alphas = [1e-6, 1e-3]
        got = bucket(alphas)
        for alpha, batched in zip(alphas, got):
            model = Koopman(
                b.system, method="lasso", lasso_alpha=alpha, **bucket_cfg
            )
            model.train(training)
            expected = get_model_rmse(model, holdout, horizon=2)
            if np.isfinite(expected):
                assert batched == pytest.approx(expected, rel=1e-5), alpha
            else:
                assert not np.isfinite(batched)

    def test_tuner_routes_only_lasso(self, data):
        """Koopman lstsq/stable candidates stay on the per-config path;
        tuner costs match the sequential run regardless."""
        from autompc_tpu.sysid import KoopmanFactory

        b, trajs = data

        def run(use_bucketed):
            rng = np.random.default_rng(31)
            evaluator = HoldoutModelEvaluator(
                system=b.system, trajs=trajs, metric="rmse", rng=rng,
                holdout_prop=0.25,
            )
            tuner = ModelTuner(
                b.system, evaluator, eval_batch=4,
                use_bucketed=use_bucketed,
            )
            tuner.add_model_factory(KoopmanFactory(b.system))
            _, result = tuner.run(rng, n_iters=4)
            return result

        res_seq = run(False)
        res_fast = run(True)
        assert [c.get_dictionary() for c in res_seq.cfgs] == [
            c.get_dictionary() for c in res_fast.cfgs
        ]
        for cs, cf in zip(res_seq.costs, res_fast.costs):
            if np.isfinite(cs) and np.isfinite(cf):
                assert cf == pytest.approx(cs, rel=1e-4)
            else:
                assert np.isinf(cs) == np.isinf(cf)
