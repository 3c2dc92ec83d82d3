"""k-step prediction accuracy graph (reference:
autompc/graphs/kstep_graph.py:10-82)."""

from __future__ import annotations

from ..evaluation.model_metrics import get_model_rmse, get_model_rmsmens


class KstepPredAccGraph:
    """Compare models by prediction error over a range of horizons."""

    def __init__(self, system, trajs, kmax, logscale=False, metric="rmse"):
        self.kmax = kmax
        self.trajs = list(trajs) if not hasattr(trajs, "to_list") else trajs.to_list()
        self.logscale = logscale
        self.models = []
        self.labels = []
        if metric == "rmse":
            self.metric = get_model_rmse
        elif metric == "rmsmens":
            self.metric = get_model_rmsmens
        else:
            raise ValueError(f"Unknown metric {metric}")

    def add_model(self, model, label):
        self.models.append(model)
        self.labels.append(label)

    def __call__(self, fig, ax):
        for model, label in zip(self.models, self.labels):
            rmses = [
                self.metric(model, self.trajs, horizon)
                for horizon in range(1, self.kmax)
            ]
            ax.plot(rmses, label=label)
        ax.set_xlabel("Prediction Horizon")
        ax.set_ylabel("Prediction Error")
        if self.logscale:
            ax.set_yscale("log")
        ax.legend()
