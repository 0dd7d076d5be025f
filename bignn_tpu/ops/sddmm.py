"""SDDMM: per-edge scores from dense node factors (SURVEY.md §2.2 N3).

Sampled dense-dense matmul: for each existing edge (s, d), compute
``score[e] = <q[d], k[s]>`` (or sum of per-head dots). Used by GAT-style
attention on the outer DDI graph (BASELINE.json:5, 8) — only existing edges
are scored, never the dense N×N attention matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bignn_tpu.ops.dispatch import get_backend
from bignn_tpu.ops.gather import gather_rows


def sddmm(
    q: jax.Array,  # [N, H, D] or [N, D] destination factors
    k: jax.Array,  # [N, H, D] or [N, D] source factors
    src: jax.Array,  # [E]
    dst: jax.Array,  # [E]
    *,
    backend: str | None = None,
) -> jax.Array:
    """Per-edge inner products; returns [E] or [E, H]."""
    b = get_backend(backend)
    if b in ("pallas", "pallas_interpret"):
        from bignn_tpu.ops.pallas.sddmm import sddmm_pallas

        return sddmm_pallas(q, k, src, dst, interpret=(b == "pallas_interpret"))
    qe = gather_rows(q, dst)
    ke = gather_rows(k, src)
    return jnp.sum(qe * ke, axis=-1)
