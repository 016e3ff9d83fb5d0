from .logging import MetricsLogger
from .profiling import StepTimer, profile_trace

__all__ = ['MetricsLogger', 'StepTimer', 'profile_trace']
