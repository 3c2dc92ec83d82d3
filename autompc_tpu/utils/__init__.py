from .simulation import simulate
