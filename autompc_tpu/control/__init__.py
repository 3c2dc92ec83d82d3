from .controller import Controller, ControllerFactory
from .lqr import LQR, LQRFactory, FiniteHorizonLQR, InfiniteHorizonLQR
from .zero import ZeroController, ZeroControllerFactory
