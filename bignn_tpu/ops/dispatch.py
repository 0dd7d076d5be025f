"""Backend dispatch for sparse ops (SURVEY.md T2).

Backends:
  * ``"xla"``    — XLA-primitive compositions (always correct, any platform).
  * ``"pallas"`` — Pallas TPU kernels; falls back to xla per-op when a kernel
                   has no Pallas implementation or the platform is not TPU.
  * ``"pallas_interpret"`` — Pallas kernels in interpret mode (CPU debugging /
                   CI without a TPU; SURVEY.md §4 item 1).
"""

from __future__ import annotations

import contextlib
import threading

_VALID = ("xla", "pallas", "pallas_interpret")
_state = threading.local()


def _get() -> str:
    return getattr(_state, "backend", "xla")


def set_backend(name: str) -> None:
    if name not in _VALID:
        raise ValueError(f"unknown backend {name!r}; valid: {_VALID}")
    _state.backend = name


def get_backend(override: str | None = None) -> str:
    if override is not None:
        if override not in _VALID:
            raise ValueError(f"unknown backend {override!r}; valid: {_VALID}")
        return override
    return _get()


@contextlib.contextmanager
def backend_scope(name: str):
    prev = _get()
    set_backend(name)
    try:
        yield
    finally:
        set_backend(prev)
