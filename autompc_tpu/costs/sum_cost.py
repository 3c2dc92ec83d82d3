"""Sum-of-costs algebra (reference: autompc/costs/sum_cost.py:503-632)."""

from __future__ import annotations

import numpy as np

from .cost import Cost


class SumCost(Cost):
    """A cost which is the sum of other cost terms; created by combining
    Cost objects with ``+``."""

    def __init__(self, system, costs):
        super().__init__(system)
        self._costs = list(costs)

    @property
    def costs(self):
        return self._costs[:]

    def get_cost_matrices(self):
        if self.is_quad:
            Q = np.zeros((self.system.obs_dim, self.system.obs_dim))
            F = np.zeros((self.system.obs_dim, self.system.obs_dim))
            R = np.zeros((self.system.ctrl_dim, self.system.ctrl_dim))
            for cost in self._costs:
                Q_, R_, F_ = cost.get_cost_matrices()
                Q += Q_
                R += R_
                F += F_
            return Q, R, F
        raise NotImplementedError

    def get_goal(self):
        # Reference quirk preserved in spirit (sum_cost.py:539-541 returns
        # the first *cost object*); we return its goal, which is what every
        # caller actually needs.
        if self.has_goal:
            return self._costs[0].get_goal()
        raise ValueError("Cost does not have goal")

    # -- summed evaluation --------------------------------------------
    def _sum_scalar(self, arg, attr):
        return sum(getattr(c, attr)(arg) for c in self._costs)

    def _sum_tuple(self, arg, attr):
        results = [getattr(c, attr)(arg) for c in self._costs]
        return tuple(sum(vals) for vals in zip(*results))

    def eval_obs_cost(self, obs):
        return self._sum_scalar(obs, "eval_obs_cost")

    def eval_obs_cost_diff(self, obs):
        return self._sum_tuple(obs, "eval_obs_cost_diff")

    def eval_obs_cost_hess(self, obs):
        return self._sum_tuple(obs, "eval_obs_cost_hess")

    def eval_ctrl_cost(self, ctrl):
        return self._sum_scalar(ctrl, "eval_ctrl_cost")

    def eval_ctrl_cost_diff(self, ctrl):
        return self._sum_tuple(ctrl, "eval_ctrl_cost_diff")

    def eval_ctrl_cost_hess(self, ctrl):
        return self._sum_tuple(ctrl, "eval_ctrl_cost_hess")

    def eval_term_obs_cost(self, obs):
        return self._sum_scalar(obs, "eval_term_obs_cost")

    def eval_term_obs_cost_diff(self, obs):
        return self._sum_tuple(obs, "eval_term_obs_cost_diff")

    def eval_term_obs_cost_hess(self, obs):
        return self._sum_tuple(obs, "eval_term_obs_cost_hess")

    # -- flags: conjunction over children (sum_cost.py:577-620) --------
    @property
    def is_quad(self):
        if not self._costs or not self._costs[0].is_quad:
            return False
        goal = self._costs[0].get_goal()
        for cost in self._costs[1:]:
            if not cost.is_quad:
                return False
            if not np.array_equal(goal, cost.get_goal()):
                return False
        return True

    @property
    def is_convex(self):
        return all(c.is_convex for c in self._costs)

    @property
    def is_diff(self):
        return all(c.is_diff for c in self._costs)

    @property
    def is_twice_diff(self):
        # Reference checks is_diff here (sum_cost.py:603-608); we check the
        # flag that is actually named.
        return all(c.is_twice_diff for c in self._costs)

    @property
    def has_goal(self):
        if not self._costs or not self._costs[0].has_goal:
            return False
        goal = self._costs[0].get_goal()
        for cost in self._costs[1:]:
            if not cost.has_goal:
                return False
            if not np.array_equal(goal, cost.get_goal()):
                return False
        return True

    def __add__(self, other):
        if isinstance(other, SumCost):
            return SumCost(self.system, [*self._costs, *other.costs])
        return SumCost(self.system, [*self._costs, other])

    def __radd__(self, other):
        if isinstance(other, SumCost):
            return SumCost(self.system, [*other.costs, *self._costs])
        return SumCost(self.system, [other, *self._costs])
