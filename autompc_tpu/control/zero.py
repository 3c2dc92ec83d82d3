"""Zero controller for debugging (reference: autompc/control/zero.py:14-46)."""

from __future__ import annotations

import jax.numpy as jnp

from ..config import ConfigurationSpace
from .controller import Controller, ControllerFactory


class ZeroControllerFactory(ControllerFactory):
    """Outputs all-zero controls. Hyperparameters: none."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.Controller = ZeroController
        self.name = "ZeroController"

    def get_configuration_space(self):
        return ConfigurationSpace()


class ZeroController(Controller):
    @property
    def state_dim(self):
        return 0

    @staticmethod
    def is_compatible(system, task, model):
        return True

    def traj_to_state(self, traj):
        return jnp.zeros(0)

    def step(self, cstate, new_obs):
        return jnp.zeros(self.system.ctrl_dim), cstate
