"""Basics: systems, trajectories, tasks, and data generation.

Mirrors the reference walkthrough (reference: examples/1_Basics.ipynb).
Run: python examples/1_basics.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import autompc_tpu as ampc
from autompc_tpu.benchmarks import CartpoleSwingupBenchmark


def main():
    # A System names the observation and control dimensions.
    system = ampc.System(["theta", "omega", "x", "dx"], ["u"], dt=0.05)
    print(system)

    # Trajectories are device-array pytrees with label indexing.
    traj = ampc.zeros(system, 10)
    traj = traj.set_obs(0, np.array([3.1, 0.0, 0.0, 0.0]))
    print("theta at t=0:", float(traj[0, "theta"]))

    # Tasks hold bounds, goals, and the cost.
    task = ampc.Task(system)
    task.set_ctrl_bound("u", -20.0, 20.0)
    task.set_num_steps(200)
    print("ctrl bounds:", task.get_ctrl_bounds().ravel())

    # Benchmarks bundle system + task + ground-truth dynamics + data.
    benchmark = CartpoleSwingupBenchmark()
    batch = benchmark.gen_trajs_batch(seed=0, n_trajs=20, traj_len=100)
    print("generated batch:", batch.obs.shape)


if __name__ == "__main__":
    main()
