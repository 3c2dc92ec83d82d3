"""Quadratic cost (reference: autompc/costs/quad_cost.py:7-51)."""

from __future__ import annotations

import jax.numpy as jnp

from .cost import Cost


class QuadCost(Cost):
    r"""Cost :math:`(x-g)^T Q (x-g) + u^T R u` per step plus terminal
    :math:`(x_N-g)^T F (x_N-g)`."""

    def __init__(self, system, Q, R, F=None, goal=None):
        super().__init__(system)
        Q = jnp.asarray(Q, dtype=jnp.result_type(float))
        R = jnp.asarray(R, dtype=jnp.result_type(float))
        if Q.shape != (system.obs_dim, system.obs_dim):
            raise ValueError("Q is the wrong shape")
        if R.shape != (system.ctrl_dim, system.ctrl_dim):
            raise ValueError("R is the wrong shape")
        if F is None:
            F = jnp.zeros((system.obs_dim, system.obs_dim))
        else:
            F = jnp.asarray(F, dtype=jnp.result_type(float))
            if F.shape != (system.obs_dim, system.obs_dim):
                raise ValueError("F is the wrong shape")
        if goal is None:
            goal = jnp.zeros(system.obs_dim)
        else:
            goal = jnp.asarray(goal, dtype=jnp.result_type(float))

        self._Q = Q
        self._R = R
        self._F = F
        self._goal = goal

        self._is_quad = True
        self._is_convex = True
        self._is_diff = True
        self._is_twice_diff = True
        self._has_goal = True
