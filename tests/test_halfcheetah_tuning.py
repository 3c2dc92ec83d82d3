"""Configs[4] slice: halfcheetah MLP surrogate + iLQR under the tuning
loop (small-scale CI version of the full pod workload)."""

import numpy as np
import pytest

import autompc_tpu as ampc
from autompc_tpu.benchmarks import HalfcheetahBenchmark
from autompc_tpu.control import IterativeLQR, IterativeLQRFactory
from autompc_tpu.costs import QuadCost, QuadCostFactory
from autompc_tpu.pipeline import Pipeline
from autompc_tpu.sysid import MLP, MLPFactory
from autompc_tpu.tuning import PipelineTuner
from autompc_tpu.utils import simulate


@pytest.fixture(scope="module")
def benchmark():
    return HalfcheetahBenchmark()


@pytest.fixture(scope="module")
def trajs(benchmark):
    return benchmark.gen_trajs_batch(seed=0, n_trajs=16, traj_len=25)


class TestHalfcheetahMLPiLQR:
    def test_ilqr_runs_on_mlp_cheetah(self, benchmark, trajs):
        """iLQR synthesizes controls through an 18-dim MLP model; the
        closed loop stays finite (optimality is the tuner's job)."""
        model = MLP(benchmark.system, n_hidden_layers=1, hidden_size=32,
                    n_train_iters=15, n_batch=64)
        model.train(trajs)
        task = benchmark.task.copy()
        # Quadratic stand-in cost (the 200-R metric is not twice-diff):
        # keep the torso near standing height, small velocities.
        goal = np.asarray(benchmark.task.get_init_obs())
        Q = np.diag([0.0, 5.0, 1.0] + [0.1] * 6 + [0.1] * 9)
        R = 0.01 * np.eye(6)
        task.set_cost(QuadCost(benchmark.system, Q, R, goal=goal))
        con = IterativeLQR(benchmark.system, task, model, horizon=8)
        traj = simulate(
            con, benchmark.task.get_init_obs(),
            term_cond=task.term_cond,
            dynamics=benchmark.dynamics, max_steps=15,
        )
        assert traj.size == 16
        assert np.isfinite(np.asarray(traj.obs)).all()

    def test_pipeline_tune_smoke(self, benchmark, trajs):
        """The full AutoML loop runs end-to-end on halfcheetah with an
        MLP surrogate (pipeline_tuner semantics; 2 iterations)."""
        rng = np.random.default_rng(1)
        mlp_factory = MLPFactory(
            benchmark.system, n_train_iters=8, n_batch=64
        )
        pipeline = Pipeline(
            benchmark.system,
            mlp_factory,
            QuadCostFactory(
                benchmark.system, goal=np.asarray(benchmark.task.get_init_obs())
            ),
            IterativeLQRFactory(benchmark.system, horizon=6),
        )
        tuner = PipelineTuner(
            surrogate_mode="defaultcfg",
            surrogate_factory=MLPFactory(
                benchmark.system, n_train_iters=8, n_batch=64
            ),
            surrogate_split=0.5,
            eval_batch=2,
        )
        task = benchmark.task.copy()
        task.set_num_steps(10)
        controller, result = tuner.run(
            pipeline, task, trajs, n_iters=2, rng=rng,
        )
        assert controller is not None
        assert len(result.costs) == 2
        # costs are the 200-R metric evaluated on surrogate rollouts
        assert all(np.isfinite(c) or c == float("inf") for c in result.costs)
