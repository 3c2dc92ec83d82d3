"""Module alias matching the reference layout (autompc.trajectory)."""

from .core.trajectory import (
    TimeStep,
    Trajectory,
    TrajectoryBatch,
    batch,
    empty,
    extend,
    from_arrays,
    zeros,
)

__all__ = [
    "TimeStep", "Trajectory", "TrajectoryBatch", "batch",
    "empty", "extend", "from_arrays", "zeros",
]
