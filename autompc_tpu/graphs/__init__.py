from .kstep_graph import KstepPredAccGraph
from .tuning_curve_graph import TuningCurveGraph
