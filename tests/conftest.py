"""Test env: CPU platform with 8 fake devices (SURVEY.md §4 item 4).

The env vars must be set before jax initializes; additionally this
environment's experimental TPU plugin ignores JAX_PLATFORMS, so we also force
the platform through jax.config (effective because conftest imports before
any test touches a device).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
