"""Module alias matching the reference layout (autompc.tasks)."""

from ..core.task import Task

__all__ = ["Task"]
