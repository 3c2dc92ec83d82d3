from .system import System
from .trajectory import (
    Trajectory,
    TrajectoryBatch,
    TimeStep,
    zeros,
    empty,
    extend,
    from_arrays,
    batch,
)
from .task import Task
