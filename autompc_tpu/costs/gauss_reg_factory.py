"""Gaussian-regularization cost factory (reference:
autompc/costs/gauss_reg_factory.py:801-832): quadratic cost with
:math:`Q = w \\Sigma_x^{-1}`, goal :math:`\\mu_x` from the training data."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import ConfigurationSpace, UniformFloatHyperparameter
from ..core.trajectory import batch as traj_batch
from .cost_factory import CostFactory
from .quad_cost import QuadCost


class GaussRegFactory(CostFactory):
    """Encourages the controller to stay close to the training-data
    distribution; typically summed with another cost."""

    def get_configuration_space(self):
        cs = ConfigurationSpace()
        cs.add_hyperparameter(
            UniformFloatHyperparameter(
                "reg_weight", lower=1e-3, upper=1e4, default_value=1.0, log=True
            )
        )
        return cs

    def is_compatible(self, system, task, Model):
        return True

    def __call__(self, cfg, task, trajs):
        tb = traj_batch(trajs)
        mask = np.asarray(tb.mask())
        X = np.asarray(tb.obs)[mask]  # (sum(L_i), obs_dim)
        mean = np.mean(X, axis=0)
        cov = np.cov(X, rowvar=False)
        cov = np.atleast_2d(cov)
        Q = cfg["reg_weight"] * np.linalg.inv(cov)
        F = np.zeros_like(Q)
        R = np.zeros((self.system.ctrl_dim, self.system.ctrl_dim))
        return QuadCost(self.system, Q, R, F, goal=mean)
