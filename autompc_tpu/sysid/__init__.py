from .model import Model, ModelFactory
from .arx import ARX, ARXFactory
from .sindy import SINDy, SINDyFactory
from .mlp import MLP, MLPFactory
from .koopman import Koopman, KoopmanFactory
from .dummy import DummyLinear, DummyNonlinear, FunctionModel, LinearizedModel
from .gp import ApproximateGPModel, ApproximateGPModelFactory, LargeGaussianProcess
