"""Threshold costs (reference: autompc/costs/thresh_cost.py:8-83).

The reference implements these with Python ``if`` statements, which cannot
trace; here they are branch-free ``jnp.where`` selects so tuning rollouts
can score trajectories entirely on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .cost import Cost


class ThresholdCost(Cost):
    r"""Returns 1 for every time step where
    :math:`\|x - x_\mathrm{goal}\|_\infty > \mathrm{threshold}`, checked
    only over observation dimensions ``obs_range[0]:obs_range[1]``."""

    def __init__(self, system, goal, obs_range, threshold):
        super().__init__(system)
        self._goal = jnp.asarray(goal, dtype=jnp.result_type(float))
        self._threshold = float(np.asarray(threshold))
        self._obs_range = (int(obs_range[0]), int(obs_range[1]))

        self._is_quad = False
        self._is_convex = False
        self._is_diff = False
        self._is_twice_diff = False
        self._has_goal = True

    def eval_obs_cost(self, obs):
        lo, hi = self._obs_range
        err = jnp.max(jnp.abs(obs[lo:hi] - self._goal[lo:hi]))
        return jnp.where(err > self._threshold, 1.0, 0.0)

    def eval_ctrl_cost(self, ctrl):
        return jnp.zeros(())

    def eval_term_obs_cost(self, obs):
        return jnp.zeros(())


class BoxThresholdCost(Cost):
    """Returns 1 for every time step where the observation falls outside
    per-dimension ``limits`` (shape (obs_dim, 2); use +/-inf to leave a
    dimension unbounded)."""

    def __init__(self, system, limits, goal=None):
        super().__init__(system)
        self._limits = jnp.asarray(limits, dtype=jnp.result_type(float))

        self._is_quad = False
        self._is_convex = False
        self._is_diff = False
        self._is_twice_diff = False

        if goal is None:
            self._has_goal = False
        else:
            self._goal = jnp.asarray(goal, dtype=jnp.result_type(float))
            self._has_goal = True

    def eval_obs_cost(self, obs):
        out = jnp.any(
            (obs < self._limits[:, 0]) | (obs > self._limits[:, 1])
        )
        return jnp.where(out, 1.0, 0.0)

    def eval_ctrl_cost(self, ctrl):
        return jnp.zeros(())

    def eval_term_obs_cost(self, obs):
        return jnp.zeros(())
