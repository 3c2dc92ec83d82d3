"""System-ID models: train, predict, compare by k-step accuracy.

Mirrors the reference walkthrough (reference: examples/2_Models.ipynb).
Run: python examples/2_models.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
from autompc_tpu.evaluation import get_model_rmse
from autompc_tpu.sysid import ARX, MLP, SINDy


def main():
    # Generate excitation data from the ground-truth cartpole.
    benchmark = CartpoleSwingupBenchmark()
    train = benchmark.gen_trajs_batch(seed=0, n_trajs=80, traj_len=100)
    holdout = benchmark.gen_trajs(seed=1, n_trajs=5, traj_len=100)

    # Three model families with the same Model contract: linear
    # autoregressive (ARX), sparse nonlinear regression (SINDy), and a
    # neural network (MLP) -- reference sysid/ equivalents.
    models = {
        "ARX(k=4)": ARX(benchmark.system, history=4),
        "SINDy(trig)": SINDy(
            benchmark.system, method="lstsq", threshold=1e-3,
            trig_basis=True, trig_interaction=True, time_mode="discrete",
        ),
        "MLP": MLP(
            benchmark.system, n_hidden_layers=2, hidden_size=64,
            n_train_iters=40,
        ),
    }
    # Train each and score k-step open-loop prediction accuracy on
    # held-out trajectories (reference evaluation/model_metrics.py).
    for name, model in models.items():
        model.train(train)
        for k in (1, 5, 20):
            rmse = get_model_rmse(model, holdout, horizon=k)
            print(f"{name:14s} {k:2d}-step RMSE: {rmse:.4f}")


if __name__ == "__main__":
    main()
