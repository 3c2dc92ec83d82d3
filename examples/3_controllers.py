"""Controllers: swing up the cartpole with SINDy + iLQR and with MPPI.

Mirrors the reference walkthrough (reference:
examples/3_Controllers_and_Tasks.ipynb). Run: python examples/3_controllers.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
from autompc_tpu.control import IterativeLQR, MPPI
from autompc_tpu.costs import QuadCost
from autompc_tpu.sysid import SINDy
from autompc_tpu.utils import simulate


def main():
    # Train a SINDy dynamics model on excitation data.
    benchmark = CartpoleSwingupBenchmark()
    trajs = benchmark.gen_trajs_batch(seed=42, n_trajs=100, traj_len=100)

    model = SINDy(
        benchmark.system, method="lstsq", threshold=1e-3,
        trig_basis=True, trig_interaction=True, time_mode="discrete",
    )
    model.train(trajs)

    # Give the task a quadratic control cost (the benchmark's own
    # threshold cost stays as the evaluation metric).
    task = benchmark.task.copy()
    task.set_cost(
        QuadCost(
            benchmark.system,
            np.diag([10.0, 0.1, 0.01, 0.01]), 0.001 * np.eye(1),
            np.diag([10.0, 0.1, 0.01, 0.01]), goal=np.zeros(4),
        )
    )

    # Swing up with two optimizers over the SAME learned model, then
    # score the closed-loop trajectory on the TRUE dynamics.
    for name, controller in [
        ("iLQR", IterativeLQR(benchmark.system, task, model, horizon=20)),
        ("MPPI", MPPI(benchmark.system, task, model,
                      horizon=20, num_path=512, sigma=1.0, lmda=0.3)),
    ]:
        traj = simulate(
            controller, benchmark.task.get_init_obs(),
            term_cond=benchmark.task.term_cond,
            dynamics=benchmark.dynamics, max_steps=200,
        )
        obs = np.asarray(traj.obs)
        print(f"{name}: final theta={obs[-1, 0]:+.3f}  "
              f"metric={float(benchmark.task.get_cost()(traj)):.0f}")


if __name__ == "__main__":
    main()
