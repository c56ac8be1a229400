from .logging import MetricLogger, Timer
from . import profiling

__all__ = ["MetricLogger", "Timer"]
