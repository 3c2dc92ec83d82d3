from .model import Model, ModelFactory
from .arx import ARX, ARXFactory
