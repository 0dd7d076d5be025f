"""Sorted-COO SpMM: y[dst] += w * x[src] (SURVEY.md §2.2 N2).

This is the neighborhood-aggregation workhorse for both levels of the model
(BASELINE.json:5 names SpMM as a required kernel class):
  * inner convs aggregate atom states over molecular bonds,
  * outer convs propagate drug embeddings over the DDI graph.

Layout contract: ``dst`` sorted ascending, padding edges have ``dst ==
num_segments`` (dropped) and ``w == 0``. The adjacency is represented as
(src, dst, w) rather than CSR indptr because with sorted dst the two are
equivalent and the flat form vectorizes better on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bignn_tpu.ops.dispatch import get_backend
from bignn_tpu.ops.gather import gather_rows
from bignn_tpu.ops.segment import segment_sum


def spmm_sorted_coo(
    x: jax.Array,  # [N, F] node features
    src: jax.Array,  # [E] int32
    dst: jax.Array,  # [E] int32, sorted ascending
    weight: jax.Array | None,  # [E] float or None (unweighted)
    num_out: int,
    *,
    src_perm: jax.Array | None = None,  # [E] argsort(src), precomputed on host
    src_sorted: jax.Array | None = None,  # [E] src[src_perm]
    block_plan: tuple | None = None,  # (estarts, tsrc, tdst, tw, tstarts)
    backend: str | None = None,
) -> jax.Array:
    """Compute ``out[i] = sum_{e: dst[e]==i} weight[e] * x[src[e]]``.

    ``src_perm``/``src_sorted`` (optional, static per graph) let the pallas
    backward run its scatter as a sorted segment-sum with **no device sort**;
    without them it argsorts ``src`` per step.

    ``block_plan`` (optional) activates the fused block-local VMEM kernel
    (ops/pallas/block_spmm.py) — valid only when the layout packs each inner
    graph wholly inside one 128-row block.
    """
    b = get_backend(backend)
    if b in ("pallas", "pallas_interpret"):
        if block_plan is not None:
            from bignn_tpu.ops.pallas.block_spmm import block_spmm

            estarts, tsrc, tdst, tw, tstarts = block_plan
            return block_spmm(
                x, src, dst, weight, estarts, tsrc, tdst,
                None if weight is None else tw, tstarts, num_out,
                interpret=(b == "pallas_interpret"),
            )
        from bignn_tpu.ops.pallas.spmm import spmm_pallas

        return spmm_pallas(
            x, src, dst, weight, num_out,
            src_perm=src_perm, src_sorted=src_sorted,
            interpret=(b == "pallas_interpret"),
        )
    msgs = gather_rows(x, src)
    if weight is not None:
        msgs = msgs * weight[:, None].astype(msgs.dtype)
    return segment_sum(msgs, dst, num_out, backend="xla")


def block_adjacency(
    src: jax.Array,
    dst: jax.Array,
    weight: jax.Array | None,
    estarts: jax.Array,
    num_nodes: int,
    out_dtype=jnp.float32,
    *,
    backend: str | None = None,
) -> jax.Array:
    """[N/128, 128, 128] block-diagonal adjacency (weighted sum, or edge
    multiplicity when ``weight`` is None) from a block-local sorted edge
    list — the one-pass build that turns every later aggregation into a
    batched MXU matmul (ops/pallas/block_adj.py has the measurements)."""
    b = get_backend(backend)
    if b in ("pallas", "pallas_interpret"):
        from bignn_tpu.ops.pallas.block_adj import build_block_adj

        return build_block_adj(
            src, dst, weight, estarts, num_nodes, out_dtype,
            interpret=(b == "pallas_interpret"),
        )
    from bignn_tpu.ops.pallas.block_adj import build_block_adj_xla

    return build_block_adj_xla(src, dst, weight, num_nodes).astype(out_dtype)


def block_diag_spmm(adj_blocks: jax.Array, x: jax.Array) -> jax.Array:
    """Dense block-diagonal SpMM: ``y = blockdiag(adj_blocks) @ x``.

    ``adj_blocks`` is [nblk, 128, 128] (dst-local x src-local within each
    128-row block of the block-local layout; sparse/formats.py builds it for
    small enough batches). One batched matmul with perfect MXU tiles — on the
    static full-graph workloads (DrugBank/BioSNAP scale) this measures ~50x
    faster than streaming the packed edge list (fwd+bwd ~10us vs ~0.5ms at
    161K edges, F=64, v5e), because the one-hot edge kernel pays
    2*block_edges*program_rows FLOPs per edge while the dense form pays
    exactly 128 MACs per matrix slot. AD handles the backward (A^T stays
    block-diagonal).
    """
    nblk = adj_blocks.shape[0]
    n, f = x.shape
    assert n == nblk * 128, (n, nblk)
    y = jax.lax.dot_general(
        adj_blocks.astype(x.dtype),
        x.reshape(nblk, 128, f),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return y.reshape(n, f).astype(x.dtype)
