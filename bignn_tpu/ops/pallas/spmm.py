"""SpMM on the pallas backend (SURVEY.md T2, §2.2 N2).

Measured on v5e (scratch/tpu_micro.py, E=10M, F=128):
  * XLA row gather ``x[src]`` already runs at HBM speed-of-light
    (319 GB/s read + write ≈ 640 GB/s total) — no kernel needed there;
  * XLA sorted segment_sum runs at 57 GB/s (scatter-add serialization) —
    that is the part the Pallas kernel replaces.

So the pallas-backend SpMM is: XLA gather+scale (fused by XLA into one
pass) feeding the Pallas one-hot-MXU segment-sum kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bignn_tpu.ops.pallas.segment import segment_sum_pallas


def spmm_pallas(
    x: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    weight: jax.Array | None,
    num_out: int,
    *,
    interpret: bool = False,
) -> jax.Array:
    msgs = jnp.take(x, src, axis=0, mode="clip")
    if weight is not None:
        msgs = msgs * weight[:, None].astype(msgs.dtype)
    return segment_sum_pallas(msgs, dst, num_out, interpret=interpret)
