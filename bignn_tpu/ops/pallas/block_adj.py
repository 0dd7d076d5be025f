"""On-device block-diagonal adjacency build (the inner-level fast path for
the resident minibatch pipeline; VERDICT round-1 item 1).

Motivation (measured on v5e, config #4: N=501K, E=1.66M, F=128, bf16): the
streaming one-hot block SpMM (ops/pallas/block_spmm.py) pays
``2 * block_edges * program_rows`` MXU FLOPs per edge on EVERY aggregation
pass — with 2 GIN layers that is 4 passes (fwd x2 + bwd x2) at ~4.5 ms each,
~18 ms of the 32 ms train step. The same one-hot contraction can instead
materialize the block-diagonal adjacency ONCE:

    A[b, d, s] = sum_e w_e * [dst_e == 128b + d] * [src_e == 128b + s]

i.e. per 128-block, ``OH_dst @ OH_src^T`` — after which every aggregation
pass is a perfectly-tiled batched [128,128]x[128,F] matmul
(ops.block_diag_spmm, 128 MACs per matrix slot, ~0.4 ms/pass incl. HBM) and
AD transposes it for free (A^T stays block-diagonal). Build cost is ~one
streaming pass; the three further passes ride the dense form.

Kernel structure mirrors block_spmm: grid over ``program_rows``-row
programs, per-program edge ranges scalar-prefetched, edges double-buffered
HBM->VMEM, masks absorb over-reads/padding; the program's SUB = PR/128
diagonal blocks are computed as SUB small [128, BE] x [BE, 128] dots (NOT
one [PR, BE] x [BE, PR] dot, which would pay SUB^2/SUB = 4x the FLOPs for
off-diagonal blocks that are zero by the block-local layout contract).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bignn_tpu.ops.pallas.util import out_struct

BLOCK_ROWS = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _block_adj_kernel(
    estarts_ref,  # [G+1] int32 scalar prefetch (program-granular)
    src_ref,  # [1, E] int32 HBM
    dst_ref,  # [1, E] int32 HBM (sorted)
    w_ref,  # [1, E] f32 HBM or None
    out_ref,  # [SUB, 128, 128] VMEM
    src_buf,  # [2, 1, BE] int32 VMEM
    dst_buf,
    w_buf,
    src_sem,
    dst_sem,
    w_sem,
    *,
    block_edges: int,
    num_edges: int,
    weighted: bool,
    program_rows: int,
):
    cdt = (jnp.bfloat16 if out_ref.dtype in (jnp.bfloat16, jnp.int8)
           else jnp.float32)
    prec = (jax.lax.Precision.DEFAULT if cdt == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    sub = program_rows // BLOCK_ROWS
    i = pl.program_id(0)
    e0 = estarts_ref[i]
    e1 = estarts_ref[i + 1]
    e0_al = (e0 // 128) * 128
    n_chunks = pl.cdiv(e1 - e0_al, block_edges)
    row0 = i * program_rows
    max_start = num_edges - block_edges

    def chunk_dma(slot, c):
        intended = e0_al + c * block_edges
        s = jnp.minimum(intended, max_start)
        s = pl.multiple_of(s, 128)
        copies = [
            pltpu.make_async_copy(
                src_ref.at[:, pl.ds(s, block_edges)], src_buf.at[slot],
                src_sem.at[slot]),
            pltpu.make_async_copy(
                dst_ref.at[:, pl.ds(s, block_edges)], dst_buf.at[slot],
                dst_sem.at[slot]),
        ]
        if weighted:
            copies.append(pltpu.make_async_copy(
                w_ref.at[:, pl.ds(s, block_edges)], w_buf.at[slot],
                w_sem.at[slot]))
        return copies

    @pl.when(n_chunks > 0)
    def _():
        for d in chunk_dma(0, 0):
            d.start()

    def body(c, acc):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            for d in chunk_dma(jax.lax.rem(c + 1, 2), c + 1):
                d.start()

        for d in chunk_dma(slot, c):
            d.wait()

        intended = e0_al + c * block_edges
        s = jnp.minimum(intended, max_start)
        shift = intended - s
        src_l = src_buf[slot].reshape(block_edges) - row0
        dst_l = dst_buf[slot].reshape(block_edges) - row0
        lanes = jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_ROWS, block_edges), 1)
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_ROWS, block_edges), 0)
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (block_edges, BLOCK_ROWS), 1)
        new = []
        for k in range(sub):
            # [128, BE]: edge e contributes to row d of sub-block k
            oh_dst = ((dst_l[None, :] - k * BLOCK_ROWS == rows)
                      & (lanes >= shift)).astype(cdt)
            # [BE, 128]: edge e sources from column s of sub-block k
            # (block-local layout: src and dst share the 128-block)
            oh_src = (src_l[:, None] - k * BLOCK_ROWS == cols).astype(cdt)
            if weighted:
                oh_src = oh_src * w_buf[slot].reshape(
                    block_edges, 1).astype(cdt)
            new.append(acc[k] + jax.lax.dot(
                oh_dst, oh_src,
                preferred_element_type=jnp.float32,
                precision=prec,
            ))
        return tuple(new)

    # tuple carry, not a stacked [SUB,128,128] with .at[k] updates — the
    # Pallas TPU lowering has no scatter-add for in-loop indexed adds
    acc = tuple(
        jnp.zeros((BLOCK_ROWS, BLOCK_ROWS), jnp.float32) for _ in range(sub))
    acc = jax.lax.fori_loop(0, n_chunks, body, acc)
    for k in range(sub):
        out_ref[k] = acc[k].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_nodes", "out_dtype", "block_edges", "interpret",
                     "program_rows"),
)
def build_block_adj(
    src: jax.Array,  # [E] int32 global ids
    dst: jax.Array,  # [E] int32 global ids, sorted
    weight: jax.Array | None,  # [E] f32 or None (None -> multiplicity count)
    estarts: jax.Array,  # [N/128 + 1] int32
    num_nodes: int,
    out_dtype=jnp.float32,
    *,
    block_edges: int = 1024,
    interpret: bool = False,
    program_rows: int = 256,
) -> jax.Array:
    """[N/128, 128, 128] block-diagonal adjacency (weighted sum or count).

    Requires the block-local layout contract (every edge's endpoints inside
    one 128-row block); out-of-block / padding edges (dst == N) mask to zero.

    r4 retuning (hoisting-free timing — the r3 sweep's "flat at 0.84 ms" was
    an XLA loop-invariant-hoisting artifact; cycle distinct batches when
    measuring): pr=256/be=1024 measures 3.40 ms at config #4 vs 4.09 for the
    r3 pr=512/be=512 default. Measured DEAD ENDS at this shape, all ~3.4 ms
    or worse — the kernel sits at the chip's MXU dot-issue rate (~0.86 us
    per depth-1024 one-hot dot, 39 TFLOP/s == the matmul anchor; dots of
    depth 512 run at HALF rate, so shrinking chunks buys nothing), i.e.
    ~one dot per 128-block is the structural floor of any one-hot build:
      * cross-program chunk-0 DMA prefetch (2-slot ring + SMEM counter):
        identical timing — not DMA-latency-bound;
      * per-block SUB=1 dots with a SUB-wide out tile (halves FLOPs):
        3.81 ms — dot COUNT, not FLOPs, is the bound;
      * 1D pre-masked shift instead of the [128, BE] AND: identical.
    Counts and 0/1 masks are exact in bf16 (integers < 256 accumulated in
    f32); weighted builds in bf16 round weights to bf16 — the compute dtype
    of the consuming matmuls anyway.
    """
    assert num_nodes % BLOCK_ROWS == 0
    n = num_nodes
    program_rows = min(program_rows, n)
    n_pad = _round_up(n, program_rows)
    nblk = n // BLOCK_ROWS
    nblk_pad = n_pad // BLOCK_ROWS
    sub = program_rows // BLOCK_ROWS
    if estarts.shape[0] < nblk_pad + 1:
        estarts = jnp.concatenate([
            estarts,
            jnp.broadcast_to(estarts[-1:], (nblk_pad + 1 - estarts.shape[0],)),
        ])
    estarts = estarts[::sub]
    grid = n_pad // program_rows

    e = src.shape[0]
    e_pad = _round_up(e, 128)
    block_edges = min(block_edges, e_pad)
    if e_pad != e:
        src = jnp.concatenate([src, jnp.zeros(e_pad - e, jnp.int32) + n])
        dst = jnp.concatenate([dst, jnp.zeros(e_pad - e, jnp.int32) + n])
        if weight is not None:
            weight = jnp.concatenate(
                [weight, jnp.zeros(e_pad - e, weight.dtype)])

    weighted = weight is not None
    scratch = [
        pltpu.VMEM((2, 1, block_edges), jnp.int32),
        pltpu.VMEM((2, 1, block_edges), jnp.int32),
        pltpu.VMEM((2, 1, block_edges), jnp.float32) if weighted else None,
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)) if weighted else None,
    ]

    def kernel(estarts_ref, src_ref, dst_ref, *rest):
        if weighted:
            w_ref, out_ref, sb, db, wb, ss, ds_, ws = rest
        else:
            out_ref, sb, db, ss, ds_ = rest
            w_ref = wb = ws = None
        _block_adj_kernel(
            estarts_ref, src_ref, dst_ref, w_ref, out_ref,
            sb, db, wb, ss, ds_, ws,
            block_edges=block_edges, num_edges=e_pad, weighted=weighted,
            program_rows=program_rows,
        )

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # src
        pl.BlockSpec(memory_space=pl.ANY),  # dst
    ]
    inputs = [src[None, :], dst[None, :]]
    if weighted:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.append(weight.astype(jnp.float32)[None, :])

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (sub, BLOCK_ROWS, BLOCK_ROWS), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[s for s in scratch if s is not None],
        ),
        out_shape=out_struct(
            (nblk_pad, BLOCK_ROWS, BLOCK_ROWS), out_dtype, estarts, *inputs),
        interpret=interpret,
    )(estarts.astype(jnp.int32), *inputs)
    return out[:nblk]


def build_block_adj_xla(src, dst, weight, num_nodes):
    """Dense XLA reference (tests): scatter-free via one-hot einsum per edge
    chunk is wasteful at scale; this is only for parity checks."""
    nblk = num_nodes // BLOCK_ROWS
    blk = dst // BLOCK_ROWS
    d_l = dst % BLOCK_ROWS
    s_l = src - blk * BLOCK_ROWS
    valid = (dst < num_nodes) & (s_l >= 0) & (s_l < BLOCK_ROWS)
    w = jnp.where(valid, 1.0 if weight is None else weight, 0.0)
    flat = (jnp.where(valid, blk, 0) * BLOCK_ROWS * BLOCK_ROWS
            + d_l * BLOCK_ROWS + jnp.clip(s_l, 0, BLOCK_ROWS - 1))
    out = jnp.zeros(nblk * BLOCK_ROWS * BLOCK_ROWS, jnp.float32)
    out = out.at[flat].add(w)
    return out.reshape(nblk, BLOCK_ROWS, BLOCK_ROWS)
