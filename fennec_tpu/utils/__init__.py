"""Utilities: stage timing, device profiling hooks, debug checks."""

from .profiling import StageTimer, device_trace, nan_check  # noqa: F401
