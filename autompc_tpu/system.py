"""Module alias matching the reference layout (autompc.system)."""

from .core.system import System

__all__ = ["System"]
