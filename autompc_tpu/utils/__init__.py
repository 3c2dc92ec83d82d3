from .simulation import simulate
from . import checkpoint
from .make_utils import make_model, make_controller, make_transformer
