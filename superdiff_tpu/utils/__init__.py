from .logging import MetricLogger, Timer

__all__ = ["MetricLogger", "Timer"]
