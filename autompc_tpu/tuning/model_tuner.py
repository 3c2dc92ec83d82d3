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

    def __init__(self, system, evaluator, eval_batch: int = 4,
                 use_bucketed: bool = True):
        """``evaluator`` scores (model_factory, cfg) pairs; ``eval_batch``
        is the number of configurations proposed per BO round.

        ``use_bucketed=True`` routes ARX candidates through the
        shape-padded batch trainer (tuning/bucketed.py): every history
        value in a batch trains and scores inside ONE compiled program
        instead of recompiling per candidate. Requires a
        HoldoutModelEvaluator with the "rmse" metric; other
        configurations fall back to the per-config path."""
        self.system = system
        self.evaluator = evaluator
        self.eval_batch = int(eval_batch)
        self.use_bucketed = bool(use_bucketed)
        self._arx_bucket = None
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

    # -- bucketed ARX fast path ----------------------------------------
    def _arx_bucket_ready(self):
        """The bucketed trainer applies when the evaluator is a holdout
        RMSE evaluator and an ARX factory is registered."""
        from ..evaluation import HoldoutModelEvaluator

        return (
            self.use_bucketed
            and isinstance(self.evaluator, HoldoutModelEvaluator)
            and self.evaluator.metric_name == "rmse"
            and any(f.name == "ARX" for f, _ in self.model_factories)
        )

    def _evaluate_batch(self, cfgs):
        """Evaluate a batch: ARX candidates go through the bucketed
        batch program, everything else through the per-config path."""
        costs = [None] * len(cfgs)
        arx_idx = []
        if self._arx_bucket_ready():
            arx_idx = [
                i for i, cfg in enumerate(cfgs) if cfg["model"] == "ARX"
            ]
        if arx_idx:
            try:
                if self._arx_bucket is None:
                    from .bucketed import ARXBucketEvaluator

                    factory, cs = next(
                        (f, cs) for f, cs in self.model_factories
                        if f.name == "ARX"
                    )
                    kmax = cs.get_hyperparameter("history").upper
                    self._arx_bucket = ARXBucketEvaluator(
                        self.system,
                        self.evaluator.training_set,
                        self.evaluator.holdout,
                        kmax=kmax,
                        horizon=self.evaluator.horizon,
                    )
                    self._arx_overrides = getattr(factory, "kwargs", {})
                ks = [
                    int(self._arx_overrides.get(
                        "history", cfgs[i].get("_ARX:history", 4)
                    ))
                    for i in arx_idx
                ]
                vals = self._arx_bucket(ks)
                for j, i in enumerate(arx_idx):
                    costs[i] = vals[j]
            except Exception:
                arx_idx = []  # fall back below
        for i, cfg in enumerate(cfgs):
            if costs[i] is None:
                costs[i] = self._evaluate(cfg)
        return costs

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
            costs = self._evaluate_batch(batch)
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
