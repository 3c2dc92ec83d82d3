from .evaluator import ModelEvaluator, HoldoutModelEvaluator
from .model_metrics import get_model_rmse, get_model_rmsmens, get_model_rmse_batch
