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

        ``use_bucketed=True`` routes ARX, MLP, and SINDy candidates
        through the batch trainers (tuning/bucketed.py): every ARX
        history value trains and scores inside ONE compiled program;
        every MLP (widths, lr) candidate with the same
        (n_hidden_layers, nonlintype) trains through one masked
        max-width program; every SINDy candidate with the same basis
        library vmaps over its regularization scalar. Requires a
        HoldoutModelEvaluator with the "rmse" metric; other
        configurations fall back to the per-config path."""
        self.system = system
        self.evaluator = evaluator
        self.eval_batch = int(eval_batch)
        self.use_bucketed = bool(use_bucketed)
        self._arx_bucket = None
        self._mlp_buckets = {}
        self._sindy_buckets = {}
        self._koopman_buckets = {}
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

    # -- bucketed fast paths --------------------------------------------
    def _bucket_ready(self, name):
        """Bucketed trainers apply when the evaluator is a holdout RMSE
        evaluator and the named factory is registered."""
        from ..evaluation import HoldoutModelEvaluator

        return (
            self.use_bucketed
            and isinstance(self.evaluator, HoldoutModelEvaluator)
            and self.evaluator.metric_name == "rmse"
            and any(f.name == name for f, _ in self.model_factories)
        )

    def _factory_overrides(self, name):
        factory = next(
            f for f, _ in self.model_factories if f.name == name
        )
        return getattr(factory, "kwargs", {})

    def _eval_arx_bucket(self, cfgs, idxs, costs):
        from .bucketed import ARXBucketEvaluator

        if self._arx_bucket is None:
            _, cs = next(
                (f, cs) for f, cs in self.model_factories
                if f.name == "ARX"
            )
            self._arx_bucket = ARXBucketEvaluator(
                self.system,
                self.evaluator.training_set,
                self.evaluator.holdout,
                kmax=cs.get_hyperparameter("history").upper,
                horizon=self.evaluator.horizon,
            )
        over = self._factory_overrides("ARX")
        ks = [
            int(over.get("history", cfgs[i].get("_ARX:history", 4)))
            for i in idxs
        ]
        vals = self._arx_bucket(ks)
        for j, i in enumerate(idxs):
            costs[i] = vals[j]

    def _eval_mlp_bucket(self, cfgs, idxs, costs):
        """Group MLP candidates by (n_hidden_layers, nonlintype) — the
        static shape/trace bucket — and run each group's (widths, lr)
        batch through one masked max-width program."""
        from .bucketed import MLPBucketEvaluator

        over = self._factory_overrides("MLP")

        def cv(cfg, name, default):
            if name in over:
                return over[name]
            return cfg.get(f"_MLP:{name}", default)

        groups = {}
        for i in idxs:
            cfg = cfgs[i]
            L = int(cv(cfg, "n_hidden_layers", "2"))
            nlt = str(cv(cfg, "nonlintype", "relu"))
            base = int(cv(cfg, "hidden_size", 128))
            widths = [
                int(cv(cfg, f"hidden_size_{j + 1}", base))
                for j in range(L)
            ]
            lr = float(cv(cfg, "lr", 1e-3))
            groups.setdefault((L, nlt), []).append((i, widths, lr))

        for (L, nlt), items in groups.items():
            bkey = ("MLP", L, nlt)
            if bkey not in self._mlp_buckets:
                self._mlp_buckets[bkey] = MLPBucketEvaluator(
                    self.system,
                    self.evaluator.training_set,
                    self.evaluator.holdout,
                    n_hidden_layers=L,
                    nonlintype=nlt,
                    horizon=self.evaluator.horizon,
                    n_train_iters=int(over.get("n_train_iters", 50)),
                    n_batch=int(over.get("n_batch", 64)),
                    seed=int(over.get("seed", 100)),
                )
            vals = self._mlp_buckets[bkey](
                [w for _, w, _ in items], [lr for _, _, lr in items]
            )
            for (i, _, _), v in zip(items, vals):
                costs[i] = v

    def _eval_sindy_bucket(self, cfgs, idxs, costs):
        """Group SINDy candidates by their basis-library configuration;
        within a group only the regularization scalar (STLSQ threshold
        or lasso alpha) varies, so the group trains as one vmapped
        solve."""
        from .bucketed import SINDyBucketEvaluator

        over = self._factory_overrides("SINDy")

        def cv(cfg, name, default):
            if name in over:
                return over[name]
            return cfg.get(f"_SINDy:{name}", default)

        groups = {}
        for i in idxs:
            cfg = cfgs[i]
            bucket_cfg = dict(
                method=str(cv(cfg, "method", "lstsq")),
                time_mode=str(cv(cfg, "time_mode", "discrete")),
                poly_basis=cv(cfg, "poly_basis", "false"),
                poly_degree=int(cv(cfg, "poly_degree", 3)),
                poly_cross_terms=cv(cfg, "poly_cross_terms", "false"),
                trig_basis=cv(cfg, "trig_basis", "false"),
                trig_freq=int(cv(cfg, "trig_freq", 1)),
                trig_interaction=cv(cfg, "trig_interaction", "false"),
            )
            reg = (
                float(cv(cfg, "lasso_alpha", 1.0))
                if bucket_cfg["method"] == "lasso"
                else float(cv(cfg, "threshold", 1e-2))
            )
            key = tuple(sorted(bucket_cfg.items()))
            groups.setdefault(key, (bucket_cfg, []))[1].append((i, reg))

        for key, (bucket_cfg, items) in groups.items():
            bkey = ("SINDy", key)
            if bkey not in self._sindy_buckets:
                self._sindy_buckets[bkey] = SINDyBucketEvaluator(
                    self.system,
                    self.evaluator.training_set,
                    self.evaluator.holdout,
                    bucket_cfg,
                    horizon=self.evaluator.horizon,
                )
            vals = self._sindy_buckets[bkey]([r for _, r in items])
            for (i, _), v in zip(items, vals):
                costs[i] = v

    def _eval_koopman_bucket(self, cfgs, idxs, costs):
        """Koopman lasso candidates sharing a lifting configuration vmap
        over their alphas; lstsq/stable candidates stay per-config
        (``costs`` left None falls through)."""
        from .bucketed import KoopmanLassoBucketEvaluator

        over = self._factory_overrides("Koopman")

        def cv(cfg, name, default):
            if name in over:
                return over[name]
            return cfg.get(f"_Koopman:{name}", default)

        groups = {}
        for i in idxs:
            cfg = cfgs[i]
            if str(cv(cfg, "method", "lstsq")) != "lasso":
                continue
            bucket_cfg = dict(
                poly_basis=cv(cfg, "poly_basis", "false"),
                poly_degree=int(cv(cfg, "poly_degree", 3)),
                trig_basis=cv(cfg, "trig_basis", "false"),
                trig_freq=int(cv(cfg, "trig_freq", 1)),
                product_terms=cv(cfg, "product_terms", "false"),
            )
            alpha = float(cv(cfg, "lasso_alpha", 1.0))
            key = tuple(sorted(bucket_cfg.items()))
            groups.setdefault(key, (bucket_cfg, []))[1].append((i, alpha))

        for key, (bucket_cfg, items) in groups.items():
            bkey = ("Koopman", key)
            if bkey not in self._koopman_buckets:
                self._koopman_buckets[bkey] = KoopmanLassoBucketEvaluator(
                    self.system,
                    self.evaluator.training_set,
                    self.evaluator.holdout,
                    bucket_cfg,
                    horizon=self.evaluator.horizon,
                )
            vals = self._koopman_buckets[bkey]([a for _, a in items])
            for (i, _), v in zip(items, vals):
                costs[i] = v

    def _evaluate_batch(self, cfgs):
        """Evaluate a batch: ARX/MLP/SINDy/Koopman-lasso candidates go
        through the bucketed batch programs, everything else through the
        per-config path."""
        costs = [None] * len(cfgs)
        for name, runner in (
            ("ARX", self._eval_arx_bucket),
            ("MLP", self._eval_mlp_bucket),
            ("SINDy", self._eval_sindy_bucket),
            ("Koopman", self._eval_koopman_bucket),
        ):
            if not self._bucket_ready(name):
                continue
            idxs = [
                i for i, cfg in enumerate(cfgs) if cfg["model"] == name
            ]
            if not idxs:
                continue
            try:
                runner(cfgs, idxs, costs)
            except Exception:
                for i in idxs:
                    costs[i] = None  # fall back below
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
