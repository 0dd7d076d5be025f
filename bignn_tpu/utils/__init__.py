"""Shared utilities: metric logging, profiling hooks."""

from bignn_tpu.utils.logging import MetricLogger
from bignn_tpu.utils.profiling import profile_trace

__all__ = ["MetricLogger", "profile_trace"]
