from .controller import Controller, ControllerFactory
from .lqr import LQR, LQRFactory, FiniteHorizonLQR, InfiniteHorizonLQR
from .zero import ZeroController, ZeroControllerFactory
from .ilqr import IterativeLQR, IterativeLQRFactory
from .mppi import MPPI, MPPIFactory
from .nmpc import DirectTranscriptionController, DirectTranscriptionControllerFactory
from .receding import make_receding_ilqr_loop
