"""SDDMM on the pallas backend (SURVEY.md T2, §2.2 N3).

Measured (scratch/tpu_micro.py): XLA row gather is HBM-bound already, and the
per-edge dot is an elementwise-multiply+reduce XLA fuses into the gathers.
There is no scatter in SDDMM, so the XLA composition *is* the fast path; this
module exists so the pallas backend has a uniform entry point, and as the
place a fused gather-dot kernel would land if profiling ever shows the
two-gather materialization mattering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sddmm_pallas(
    q: jax.Array,
    k: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    del interpret
    qe = jnp.take(q, dst, axis=0, mode="clip")
    ke = jnp.take(k, src, axis=0, mode="clip")
    return jnp.sum(qe * ke, axis=-1)
