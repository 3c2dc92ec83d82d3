from .cost import Cost
from .quad_cost import QuadCost
from .thresh_cost import ThresholdCost, BoxThresholdCost
from .sum_cost import SumCost
from .cost_factory import CostFactory
from .quad_cost_factory import QuadCostFactory
from .gauss_reg_factory import GaussRegFactory
from .sum_cost_factory import SumCostFactory
