"""Row gather (SURVEY.md §2.2 N4: replaces ATen index_select).

Used for: source-node lookup in message passing, and endpoint-embedding lookup
for edge scoring / negative sampling (SURVEY.md §3.2 SCORING).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bignn_tpu.ops.dispatch import get_backend


def gather_rows(
    table: jax.Array,
    indices: jax.Array,
    *,
    backend: str | None = None,
) -> jax.Array:
    """``table[indices]`` with clipped out-of-range indices (padding-safe)."""
    del backend  # XLA's gather is already near-optimal on TPU for row lookup
    return jnp.take(table, indices, axis=0, mode="clip")
