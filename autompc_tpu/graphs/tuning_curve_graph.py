"""Tuning-curve graph (reference:
autompc/graphs/tuning_curve_graph.py:86-110)."""

from __future__ import annotations

from ..tuning.model_tuner import ModelTuneResult
from ..tuning.pipeline_tuner import PipelineTuneResult


class TuningCurveGraph:
    """Plot the incumbent-cost curve of a tuning run."""

    def __call__(self, ax, tune_result):
        if isinstance(tune_result, PipelineTuneResult):
            if tune_result.inc_truedyn_costs:
                ax.plot(tune_result.inc_truedyn_costs, label="True Dyn. Cost")
            ax.plot(tune_result.inc_costs, label="Surr. Cost")
            ax.set_xlabel("Tuning Iteration")
            ax.set_ylabel("Cost")
            ax.legend()
        elif isinstance(tune_result, ModelTuneResult):
            ax.plot(tune_result.inc_costs, label="Surr. Cost")
            ax.set_xlabel("Tuning Iteration")
            ax.set_ylabel("Model Error")
        else:
            raise TypeError("Expected a tune result")
