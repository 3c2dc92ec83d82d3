"""Model evaluators (reference: autompc/evaluation/evaluator.py:7-60 and
holdout_evaluator.py:70-121)."""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np

from .model_metrics import get_model_rmse, get_model_rmsmens


class ModelEvaluator(ABC):
    """Evaluates model configurations by prediction accuracy."""

    def __init__(self, system, trajs, metric, rng, horizon=1):
        self.system = system
        self.trajs = list(trajs) if not hasattr(trajs, "to_list") else trajs.to_list()
        self.rng = rng
        # Introspection for batched fast paths (tuning/bucketed.py):
        # which named metric and horizon this evaluator scores with.
        self.metric_name = metric if isinstance(metric, str) else None
        self.horizon = horizon
        if isinstance(metric, str):
            if metric == "rmse":
                self.metric = lambda model, trajs: get_model_rmse(
                    model, trajs, horizon=horizon
                )
            elif metric == "rmsmens":
                self.metric = lambda model, trajs: get_model_rmsmens(
                    model, trajs, horizon=horizon
                )
            else:
                raise ValueError(f"Unknown metric {metric}")
        else:
            self.metric = metric

    @abstractmethod
    def __call__(self, model_factory, configuration):
        raise NotImplementedError


class HoldoutModelEvaluator(ModelEvaluator):
    """Train on a split, score on a held-out set
    (holdout_evaluator.py:70-121)."""

    def __init__(self, *args, holdout_prop=0.1, holdout_set=None,
                 verbose=False, **kwargs):
        super().__init__(*args, **kwargs)
        self.verbose = verbose
        if holdout_set is None:
            holdout_size = round(holdout_prop * len(self.trajs))
            holdout_indices = self.rng.choice(
                np.arange(len(self.trajs)), holdout_size, replace=False
            )
            holdout_idx = set(int(i) for i in holdout_indices)
            self.holdout = [self.trajs[i] for i in sorted(holdout_idx)]
            self.training_set = [
                t for i, t in enumerate(self.trajs) if i not in holdout_idx
            ]
        else:
            self.holdout = list(holdout_set)
            self.training_set = [t for t in self.trajs if t not in self.holdout]

    def __call__(self, model_factory, configuration):
        model = model_factory(configuration, self.training_set)
        value = self.metric(model, self.holdout)
        if not np.isfinite(value):
            # Bad config => inf score; tuning continues
            # (pipeline_tuner.py:236-239 contract).
            return float("inf")
        return value
