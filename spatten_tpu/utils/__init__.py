"""Shared utilities: profiling/tracing hooks, structured logging."""

from spatten_tpu.utils.profiling import profile_trace, annotate
from spatten_tpu.utils.logging import get_logger

__all__ = ["profile_trace", "annotate", "get_logger"]
