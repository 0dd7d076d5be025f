"""Backend dispatch for sparse ops (SURVEY.md T2).

Backends:
  * ``"auto"``   — (default) Pallas kernels on TPU, XLA elsewhere.
  * ``"xla"``    — XLA-primitive compositions (always correct, any platform).
  * ``"pallas"`` — Pallas TPU kernels.
  * ``"pallas_interpret"`` — Pallas kernels in interpret mode (CPU debugging /
                   CI without a TPU; SURVEY.md §4 item 1).
"""

from __future__ import annotations

import contextlib
import functools
import threading

_VALID = ("auto", "xla", "pallas", "pallas_interpret")
_state = threading.local()


@functools.cache
def _platform_default() -> str:
    import jax

    # the axon plugin registers TPU devices under platform "axon"
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return "xla"
    return "pallas" if platform in ("tpu", "axon") else "xla"


def _get() -> str:
    return getattr(_state, "backend", "auto")


def set_backend(name: str) -> None:
    if name not in _VALID:
        raise ValueError(f"unknown backend {name!r}; valid: {_VALID}")
    _state.backend = name


def get_backend(override: str | None = None) -> str:
    if override is not None:
        if override not in _VALID:
            raise ValueError(f"unknown backend {override!r}; valid: {_VALID}")
        name = override
    else:
        name = _get()
    if name == "auto":
        return _platform_default()
    return name


@contextlib.contextmanager
def backend_scope(name: str):
    prev = _get()
    set_backend(name)
    try:
        yield
    finally:
        set_backend(prev)
