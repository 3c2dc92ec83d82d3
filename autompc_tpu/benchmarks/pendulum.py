"""Pendulum swing-up benchmark (BASELINE.json configs[2] companion task;
no reference counterpart — gym-classic dynamics in jax)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.system import System
from ..core.task import Task
from ..costs import ThresholdCost
from . import data_generation as dg
from .benchmark import Benchmark


def pendulum_dynamics(y, u, dt=0.05, g=9.8, m=1.0, L=1.0, b=0.1):
    """Euler-discretized pendulum: theta=0 is upright."""
    theta, omega = y[0], y[1]
    u0 = u[0] if jnp.ndim(u) > 0 else u
    omega_dot = (
        g * jnp.sin(theta) / L - b * omega / (m * L * L) + u0 / (m * L * L)
    )
    return jnp.stack([theta + dt * omega, omega + dt * omega_dot])


class PendulumSwingupBenchmark(Benchmark):
    """Swing the pendulum from down (theta=pi) to upright."""

    def __init__(self, data_gen_method="uniform_random"):
        system = System(["theta", "omega"], ["u"], dt=0.05)
        cost = ThresholdCost(
            system, goal=np.zeros(2), threshold=0.2, obs_range=(0, 2)
        )
        task = Task(system)
        task.set_cost(cost)
        task.set_ctrl_bound("u", -2.0, 2.0)
        task.set_init_obs(np.array([np.pi, 0.0]))
        task.set_num_steps(200)
        super().__init__("pendulum_swingup", system, task, data_gen_method)

    def dynamics(self, x, u):
        return pendulum_dynamics(x, u, dt=self.system.dt)

    def _gen_trajs(self, n_trajs, traj_len, rng):
        init_min = np.array([-np.pi, -1.0])
        init_max = np.array([np.pi, 1.0])
        common = dict(
            system=self.system, task=self.task, dynamics=self.dynamics,
            rng=rng, init_min=init_min, init_max=init_max,
            traj_len=traj_len, n_trajs=n_trajs,
        )
        if self._data_gen_method == "uniform_random":
            return dg.uniform_random_generate_batch(**common)
        elif self._data_gen_method == "multisine":
            return dg.multisine_generate_batch(n_freqs=20, **common)
        elif self._data_gen_method == "random_walk":
            return dg.random_walk_generate_batch(walk_rate=1.0, **common)
        raise ValueError(f"Unknown data_gen_method {self._data_gen_method}")

    def gen_trajs(self, seed, n_trajs, traj_len=200):
        return self.gen_trajs_batch(seed, n_trajs, traj_len).to_list()

    def gen_trajs_batch(self, seed, n_trajs, traj_len=200):
        rng = np.random.default_rng(seed)
        return self._gen_trajs(n_trajs, traj_len, rng)

    @staticmethod
    def data_gen_methods():
        return ["uniform_random", "multisine", "random_walk"]
