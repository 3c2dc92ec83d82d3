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
