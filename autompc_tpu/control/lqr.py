"""LQR controllers (reference: autompc/control/lqr.py:15-253).

The Riccati recursions run as XLA loops (ops/riccati.py) instead of Python
loops; the gain is computed once at construction and the per-step policy
``u = clip(K (x - x_goal))`` is a pure traceable step function.

The reference's ``InfiniteHorizonLQR`` is broken (calls an undefined
``dare``, lqr.py:104); here it is implemented correctly via Riccati
fixed-point iteration (ops/riccati.py:infinite_horizon_lqr).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import (
    CategoricalHyperparameter,
    ConfigurationSpace,
    InCondition,
    UniformIntegerHyperparameter,
)
from ..ops.riccati import finite_horizon_lqr, infinite_horizon_lqr
from .controller import Controller, ControllerFactory


def _embed_cost_matrices(model, task):
    """Pad the obs-space Q/F matrices up to the model state dimension
    (lqr.py:149-157 semantics)."""
    Q, R, F = task.get_cost().get_cost_matrices()
    ds = model.state_dim
    Qp = np.zeros((ds, ds))
    Qp[: Q.shape[0], : Q.shape[1]] = Q
    Fp = np.zeros((ds, ds))
    Fp[: F.shape[0], : F.shape[1]] = F
    return jnp.asarray(Qp), jnp.asarray(R), jnp.asarray(Fp)


def _embed_goal(model, task):
    goal = task.get_cost().get_goal()
    ds = model.state_dim
    state0 = np.zeros(ds)
    state0[: goal.size] = goal
    return jnp.asarray(state0)


class _LQRBase(Controller):
    """Shared step logic: controller state is ``concat([model_state,
    last_ctrl])`` (lqr.py:135-147, 160-171 semantics)."""

    def __init__(self, system, task, model):
        super().__init__(system, task, model)
        self.K = None  # set by subclass
        self._state0 = _embed_goal(model, task)
        bounds = task.get_ctrl_bounds()
        self._umin = jnp.asarray(bounds[:, 0])
        self._umax = jnp.asarray(bounds[:, 1])
        self._model_params = model.params

    @property
    def state_dim(self):
        return self.model.state_dim + self.system.ctrl_dim

    def traj_to_state(self, traj):
        return jnp.concatenate([self.model.traj_to_state(traj), traj[-1].ctrl])

    def step(self, cstate, new_obs):
        m = self.system.ctrl_dim
        modelstate = self.model.update_state_core(
            self._model_params, cstate[:-m], cstate[-m:], new_obs
        )
        u = self.K @ (modelstate - self._state0)
        u = jnp.clip(u, self._umin, self._umax)
        return u, jnp.concatenate([modelstate, u])


class FiniteHorizonLQR(_LQRBase):
    def __init__(self, system, task, model, horizon):
        super().__init__(system, task, model)
        A, B = model.to_linear()
        Qp, R, Fp = _embed_cost_matrices(model, task)
        N = jnp.zeros((A.shape[0], B.shape[1]))
        self.horizon = int(horizon)
        self.K, self._P = finite_horizon_lqr(A, B, Qp, R, N, Fp, self.horizon)
        self.Qp, self.Rp = Qp, R

    @staticmethod
    def is_compatible(system, task, model):
        return (
            model.is_linear
            and task.get_cost().is_quad
            and not task.are_obs_bounded()
            and not task.eq_cons_present()
            and not task.ineq_cons_present()
        )


class InfiniteHorizonLQR(_LQRBase):
    def __init__(self, system, task, model):
        super().__init__(system, task, model)
        A, B = model.to_linear()
        Qp, R, _ = _embed_cost_matrices(model, task)
        self.K, self._P = infinite_horizon_lqr(A, B, Qp, R)
        self.Qp, self.Rp = Qp, R

    @staticmethod
    def is_compatible(system, task, model):
        return (
            model.is_linear
            and task.get_cost().is_quad
            and not task.are_obs_bounded()
            and not task.are_ctrl_bounded()
            and not task.eq_cons_present()
            and not task.ineq_cons_present()
        )


class LQR(Controller):
    """Dispatcher over finite/infinite horizon (lqr.py:226-253)."""

    def __init__(self, system, task, model, finite_horizon, horizon=None):
        super().__init__(system, task, model)
        if not isinstance(finite_horizon, bool):
            finite_horizon = finite_horizon == "true"
        if finite_horizon:
            self._controller = FiniteHorizonLQR(system, task, model, horizon)
        else:
            self._controller = InfiniteHorizonLQR(system, task, model)

    @property
    def state_dim(self):
        return self._controller.state_dim

    @staticmethod
    def is_compatible(system, task, model):
        return (
            model.is_linear
            and task.get_cost().is_quad
            and not task.are_obs_bounded()
            and not task.eq_cons_present()
            and not task.ineq_cons_present()
        )

    def traj_to_state(self, traj):
        return self._controller.traj_to_state(traj)

    def step(self, cstate, new_obs):
        return self._controller.step(cstate, new_obs)


class LQRFactory(ControllerFactory):
    """Hyperparameters (lqr.py:194-224):

    - *finite_horizon* (categorical ["true", "false"], default "true")
    - *horizon* (int, 1..1000, default 10; conditioned on
      finite_horizon == "true")
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.Controller = LQR
        self.name = "LQR"

    def get_configuration_space(self):
        cs = ConfigurationSpace()
        finite_horizon = CategoricalHyperparameter(
            "finite_horizon", choices=["true", "false"], default_value="true"
        )
        horizon = UniformIntegerHyperparameter(
            "horizon", lower=1, upper=1000, default_value=10
        )
        cs.add_hyperparameters([horizon, finite_horizon])
        cs.add_condition(InCondition("horizon", "finite_horizon", ["true"]))
        return cs
