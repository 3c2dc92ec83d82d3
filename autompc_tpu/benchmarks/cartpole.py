"""Cartpole swing-up benchmark.

Re-creates the reference cartpole benchmarks (reference:
autompc/benchmarks/cartpole.py:17-226 and cartpole_v2.py:39-158) with the
dynamics as pure jax functions (exact Euler-step semantics of
``dt_cartpole_dynamics``, cartpole.py:34-36, including the ``b=1.0``
damping override at the benchmark level, cartpole.py:140, and v2's
``g=0.8`` quirk, cartpole_v2.py:61).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.system import System
from ..core.task import Task
from ..costs import BoxThresholdCost, ThresholdCost
from . import data_generation as dg
from .benchmark import Benchmark


def cartpole_simp_dynamics(y, u, g=9.8, m=1.0, L=1.0, b=0.1):
    """Continuous-time simplified cartpole (cartpole.py:17-32)."""
    theta, omega, x, dx = y[0], y[1], y[2], y[3]
    return jnp.stack(
        [
            omega,
            g * jnp.sin(theta) / L
            - b * omega / (m * L * L)
            + u * jnp.cos(theta) / L,
            dx,
            u,
        ]
    )


def dt_cartpole_dynamics(y, u, dt, g=9.8, m=1.0, L=1.0, b=1.0):
    """Euler discretization (cartpole.py:34-36). ``u`` may be scalar or
    shape (1,)."""
    u0 = u[0] if jnp.ndim(u) > 0 else u
    return y + dt * cartpole_simp_dynamics(y, u0, g, m, L, b)


class CartpoleSwingupBenchmark(Benchmark):
    """Swing the pole from down to up; metric counts steps with angle or
    angular velocity more than 0.2 from the goal (cartpole.py:116-136)."""

    def __init__(self, data_gen_method="uniform_random"):
        system = System(["theta", "omega", "x", "dx"], ["u"], dt=0.05)
        cost = ThresholdCost(
            system, goal=np.zeros(4), threshold=0.2, obs_range=(0, 3)
        )
        task = Task(system)
        task.set_cost(cost)
        task.set_ctrl_bound("u", -20.0, 20.0)
        task.set_init_obs(np.array([3.1, 0.0, 0.0, 0.0]))
        task.set_num_steps(200)
        super().__init__("cartpole_swingup", system, task, data_gen_method)

    def dynamics(self, x, u):
        return dt_cartpole_dynamics(x, u, self.system.dt, g=9.8, m=1, L=1, b=1.0)

    def _gen_trajs(self, n_trajs, traj_len, rng):
        init_min = np.array([-1.0, 0.0, 0.0, 0.0])
        init_max = np.array([1.0, 0.0, 0.0, 0.0])
        common = dict(
            system=self.system, task=self.task, dynamics=self.dynamics, rng=rng,
            init_min=init_min, init_max=init_max,
            traj_len=traj_len, n_trajs=n_trajs,
        )
        if self._data_gen_method == "uniform_random":
            return dg.uniform_random_generate_batch(**common)
        elif self._data_gen_method == "periodic_control":
            return dg.periodic_control_generate_batch(U_1=np.ones(1), **common)
        elif self._data_gen_method == "multisine":
            return dg.multisine_generate_batch(n_freqs=20, **common)
        elif self._data_gen_method == "random_walk":
            return dg.random_walk_generate_batch(walk_rate=1.0, **common)
        elif self._data_gen_method == "prbs":
            return dg.prbs_generate_batch(
                states=np.array([-20.0, 20.0]), Nswitch=10, **common
            )
        raise ValueError(f"Unknown data_gen_method {self._data_gen_method}")

    def gen_trajs(self, seed, n_trajs, traj_len=200):
        return self.gen_trajs_batch(seed, n_trajs, traj_len).to_list()

    def gen_trajs_batch(self, seed, n_trajs, traj_len=200):
        rng = np.random.default_rng(seed)
        return self._gen_trajs(n_trajs, traj_len, rng)

    def visualize(self, fig, ax, traj, margin=5.0):
        """Matplotlib animation of the cartpole (cartpole.py:63-114)."""
        from ..graphs.animation import animate_cartpole

        return animate_cartpole(fig, ax, traj, self.system.dt, margin)

    @staticmethod
    def data_gen_methods():
        return [
            "uniform_random",
            "periodic_control",
            "multisine",
            "random_walk",
            "prbs",
        ]


class CartpoleSwingupV2Benchmark(CartpoleSwingupBenchmark):
    """Variant with a box-threshold metric keeping the cart within
    [-10, 10] and the reference's g=0.8 dynamics quirk
    (cartpole_v2.py:39-66)."""

    def __init__(self, data_gen_method="uniform_random"):
        Benchmark.__init__(
            self,
            "cartpole_swingup",
            System(["theta", "omega", "x", "dx"], ["u"], dt=0.05),
            None,
            data_gen_method,
        )
        system = self.system
        limits = np.array(
            [[-0.2, 0.2], [-0.2, 0.2], [-10.0, 10.0], [-np.inf, np.inf]]
        )
        cost = BoxThresholdCost(system, limits, goal=np.zeros(4))
        task = Task(system)
        task.set_cost(cost)
        task.set_ctrl_bound("u", -20.0, 20.0)
        task.set_init_obs(np.array([3.1, 0.0, 0.0, 0.0]))
        task.set_num_steps(200)
        self.task = task

    def dynamics(self, x, u):
        # Reference quirk: v2 uses g=0.8 (cartpole_v2.py:61).
        return dt_cartpole_dynamics(x, u, self.system.dt, g=0.8, m=1, L=1, b=1.0)

    def get_cached_tune_result(self):
        """Load the shipped tune-result asset (cartpole_v2.py:146-153
        parity; generated by a fan-out PipelineTuner run)."""
        import os

        from ..utils.checkpoint import load_checkpoint

        path = os.path.join(
            os.path.dirname(__file__),
            "../../assets/cached_tunes/cartpole_tune_result.ckpt",
        )
        return load_checkpoint(path)
