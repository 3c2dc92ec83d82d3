"""Model tuner: select and tune system-ID models by prediction accuracy.

Re-creates the reference ModelTuner (reference:
autompc/tuning/model_tuner.py:66-198): a categorical ``model`` selector
with per-model conditioned subspaces (prefix ``_<Name>:``), optimized by
the batched BO core (tuning/bo.py) instead of SMAC.
"""

from __future__ import annotations

from collections import namedtuple

import numpy as np

from ..config import (
    CategoricalHyperparameter,
    ConfigurationSpace,
    add_configuration_space,
)
from .bo import BatchBayesOpt

ModelTuneResult = namedtuple(
    "ModelTuneResult", ["inc_cfg", "cfgs", "inc_cfgs", "costs", "inc_costs"]
)
"""Tuning history: final incumbent config, per-iteration configs/costs,
and the incumbent config/cost at each iteration
(model_tuner.py:37-65 semantics)."""


class ModelTuner:
    """Tunes system-ID models based on prediction accuracy."""

    def __init__(self, system, evaluator, eval_batch: int = 4):
        """``evaluator`` scores (model_factory, cfg) pairs; ``eval_batch``
        is the number of configurations proposed per BO round."""
        self.system = system
        self.evaluator = evaluator
        self.eval_batch = int(eval_batch)
        self.model_factories = []

    def add_model_factory(self, model_factory, cs=None):
        if cs is None:
            cs = model_factory.get_configuration_space()
        self.model_factories.append((model_factory, cs))

    def _build_space(self) -> ConfigurationSpace:
        cs_combined = ConfigurationSpace()
        model_choice = CategoricalHyperparameter(
            "model",
            choices=[f.name for f, _ in self.model_factories],
        )
        cs_combined.add_hyperparameter(model_choice)
        for model_factory, cs in self.model_factories:
            add_configuration_space(
                cs_combined,
                "_" + model_factory.name,
                cs,
                parent_hyperparameter={"parent": "model", "value": model_factory.name},
            )
        return cs_combined

    def _get_model_cfg(self, cfg_combined):
        """Extract the selected factory and its (unprefixed) sub-config
        (model_tuner.py:104-115)."""
        for model_factory, cs in self.model_factories:
            if model_factory.name != cfg_combined["model"]:
                continue
            cfg = cs.get_default_configuration()
            prefix = "_" + model_factory.name + ":"
            for key, val in cfg_combined.get_dictionary().items():
                if key.startswith(prefix):
                    cfg[key[len(prefix):]] = val
            return model_factory, cfg
        raise ValueError(f"Unknown model {cfg_combined['model']}")

    def _evaluate(self, cfg_combined):
        model_factory, cfg = self._get_model_cfg(cfg_combined)
        try:
            value = float(self.evaluator(model_factory, cfg))
        except Exception:
            value = float("inf")
        if not np.isfinite(value):
            value = float("inf")
        return value

    def run(self, rng, n_iters=10):
        """Run tuning; returns (final trained model, ModelTuneResult)."""
        if hasattr(rng, "integers"):
            np_rng = rng
        else:
            np_rng = np.random.default_rng(int(rng))
        space = self._build_space()
        bo = BatchBayesOpt(space, rng=np_rng, batch_size=self.eval_batch)

        evaluated_cfgs, evaluated_costs = [], []
        remaining = int(n_iters)
        while remaining > 0:
            batch = bo.ask(min(self.eval_batch, remaining))
            costs = [self._evaluate(cfg) for cfg in batch]
            bo.tell(batch, costs)
            evaluated_cfgs.extend(batch)
            evaluated_costs.extend(costs)
            remaining -= len(batch)

        inc_cost = float("inf")
        inc_cfg = None
        inc_cfgs, inc_costs = [], []
        for cfg, cost in zip(evaluated_cfgs, evaluated_costs):
            if cost < inc_cost:
                inc_cost = cost
                inc_cfg = cfg
            inc_costs.append(inc_cost)
            inc_cfgs.append(inc_cfg)

        tune_result = ModelTuneResult(
            inc_cfg=inc_cfg,
            cfgs=evaluated_cfgs,
            costs=evaluated_costs,
            inc_costs=inc_costs,
            inc_cfgs=inc_cfgs,
        )
        model_factory, final_cfg = self._get_model_cfg(inc_cfg)
        final_model = model_factory(final_cfg, self.evaluator.trajs)
        return final_model, tune_result
