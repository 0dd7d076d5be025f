"""Profiling hooks (SURVEY.md §5 tracing row).

Wraps jax.profiler so the bench harness and trainer can capture traces with
one flag; traces open in TensorBoard/XProf or Perfetto.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Trace the enclosed block to ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
