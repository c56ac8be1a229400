from .logging import MetricLogger, Timer
from .cache import enable_compilation_cache
from . import images, profiling

__all__ = ["MetricLogger", "Timer", "enable_compilation_cache", "images", "profiling"]
