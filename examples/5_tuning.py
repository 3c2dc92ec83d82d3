"""AutoML: tune a SINDy + QuadCost + iLQR pipeline on cartpole.

Mirrors the reference main demo (reference: examples/0_MainDemo.ipynb,
5_Tuning.ipynb) — but where the reference's 100-iteration SMAC tune
"can take 5 or more hours", the batched objective here evaluates
candidates in parallel. Run: python examples/5_tuning.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
from autompc_tpu.control import IterativeLQRFactory
from autompc_tpu.costs import QuadCostFactory
from autompc_tpu.pipeline import Pipeline
from autompc_tpu.sysid import SINDyFactory
from autompc_tpu.tuning import PipelineTuner
from autompc_tpu.utils import simulate


def main():
    # Data for both the surrogate and the per-candidate sysid models.
    benchmark = CartpoleSwingupBenchmark()
    trajs = benchmark.gen_trajs(seed=42, n_trajs=60, traj_len=100)

    # The pipeline = {model factory, cost factory, controller factory};
    # its joint configuration space is what the tuner searches
    # (reference pipeline.py / tuning/pipeline_tuner.py).
    pipeline = Pipeline(
        benchmark.system,
        SINDyFactory(benchmark.system),
        QuadCostFactory(benchmark.system),
        IterativeLQRFactory(benchmark.system),
    )
    # Batched Bayesian optimization: candidates are proposed in
    # batches and evaluated closed-loop against the surrogate model.
    tuner = PipelineTuner(
        surrogate_mode="defaultcfg",
        surrogate_factory=SINDyFactory(benchmark.system),
        surrogate_split=0.5,
        eval_batch=4,
    )
    controller, result = tuner.run(
        pipeline, benchmark.task, trajs,
        n_iters=12, rng=np.random.default_rng(0),
        truedyn=benchmark.dynamics,
        checkpoint_path="/tmp/cartpole_tune.ckpt",
    )
    print("incumbent surrogate cost:", result.inc_costs[-1])
    print("incumbent config:", result.inc_cfg)

    traj = simulate(
        controller, benchmark.task.get_init_obs(),
        term_cond=benchmark.task.term_cond,
        dynamics=benchmark.dynamics, max_steps=200,
    )
    print("true-dynamics metric:",
          float(benchmark.task.get_cost()(traj)))


if __name__ == "__main__":
    main()
