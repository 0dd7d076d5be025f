"""Block-local fused SpMM: gather + weight + scatter in one VMEM-resident
Pallas kernel (SURVEY.md T2; the inner-level aggregation fast path).

Motivation (measured on v5e at config-#4 scale, E=2.3M, F=128, N=655K):
the unfused pipeline ``take(x, src)`` (25.8 ms, latency-bound 93 GB/s) +
sorted-segment-sum kernel (15.4 ms — low-degree blocks average ~450 edges,
so the 128-row grid over-reads and pays per-block DMA latency) moves the
[E, F] message matrix through HBM twice. Molecule graphs are tiny (<= 128
nodes each), so when the disjoint-union layout packs every molecule wholly
inside one 128-row block, each block's edges reference ONLY in-block rows:

    out[128i:128(i+1)] = OH_dst @ (w * (OH_src @ x_block))

two one-hot matmuls on the MXU with x_block resident in VMEM — HBM traffic
drops to read-x-once + write-out-once (~0.7 GB vs ~5 GB), with no [E, F]
intermediate at all.

Layout contract (enforced by the callers that build block-aligned unions —
data/hierarchical.py resident expansion and sparse/bucketing block_align):
  * x has N % 128 == 0 rows; edges sorted by dst; for every edge in block
    i's range, BOTH endpoints lie in [128i, 128(i+1)) — out-of-block ids
    (e.g. over-read neighbors, padding with dst == N) zero out via the
    one-hot masks, so violations produce dropped messages, never corruption;
  * ``estarts`` [N/128 + 1] gives each block's edge range (host- or
    device-computed via one searchsorted over the sorted dst).

Backward: d_x = A^T @ g has the same block locality (molecule edges stay in
the molecule), so the VJP runs the SAME kernel over the source-sorted edge
list (tsrc/tdst/tw + tstarts — the transpose tables the layout layer already
carries for the sort-free scatter path). d_w (weighted case) falls back to
two XLA gathers + a per-edge dot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bignn_tpu.ops.pallas.util import out_struct


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


BLOCK_ROWS = 128  # fixed: molecule-alignment granule == MXU tile


def _block_spmm_kernel(
    estarts_ref,  # [G+1] int32 scalar prefetch
    src_ref,  # [1, E] int32 HBM (global ids)
    dst_ref,  # [1, E] int32 HBM (global ids, sorted)
    w_ref,  # [1, E] f32 HBM (or None — unweighted)
    x_ref,  # [BR, F] VMEM (block i of x)
    out_ref,  # [BR, F] VMEM
    src_buf,  # [2, 1, BE] int32 VMEM
    dst_buf,
    w_buf,  # [2, 1, BE] f32 VMEM (or None)
    src_sem,
    dst_sem,
    w_sem,
    *,
    block_edges: int,
    num_edges: int,
    weighted: bool,
    program_rows: int,
):
    # bf16 inputs ride the fast MXU path (one-hot masks are exact in bf16;
    # both dots accumulate in f32 via preferred_element_type); f32 inputs
    # keep HIGHEST precision as before.
    cdt = x_ref.dtype if x_ref.dtype == jnp.bfloat16 else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if cdt == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    i = pl.program_id(0)
    e0 = estarts_ref[i]
    e1 = estarts_ref[i + 1]
    e0_al = (e0 // 128) * 128  # align to the DMA granule; masks absorb
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

    x_block = x_ref[:].astype(cdt)  # [BR, F]

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
        shift = intended - s  # lanes < shift were counted in an earlier chunk
        src_l = src_buf[slot] - row0  # [1, BE] local ids
        dst_l = dst_buf[slot] - row0

        # gather: msgs[e] = x_block[src_l[e]]  ==  OH_src_t @ x_block
        e_rows = jax.lax.broadcasted_iota(
            jnp.int32, (block_edges, program_rows), 0)
        r_cols = jax.lax.broadcasted_iota(
            jnp.int32, (block_edges, program_rows), 1)
        oh_src_t = (src_l.reshape(block_edges, 1) == r_cols).astype(cdt)
        msgs = jax.lax.dot(
            oh_src_t, x_block,
            preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(cdt)  # [BE, F]
        if weighted:
            msgs = msgs * w_buf[slot].reshape(block_edges, 1).astype(cdt)

        # scatter: acc[d] += msgs[e] for dst_l[e] == d  ==  OH_dst @ msgs.
        # The dst mask also drops over-read edges (local id out of range)
        # and earlier-counted lanes.
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (program_rows, block_edges), 0)
        lanes = jax.lax.broadcasted_iota(
            jnp.int32, (program_rows, block_edges), 1)
        oh_dst = ((dst_l == rows) & (lanes >= shift)).astype(cdt)
        return acc + jax.lax.dot(
            oh_dst, msgs,
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    acc = jnp.zeros((program_rows, out_ref.shape[1]), jnp.float32)
    acc = jax.lax.fori_loop(0, n_chunks, body, acc)
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_nodes", "block_edges", "interpret", "program_rows"),
)
def _block_spmm_impl(
    x: jax.Array,  # [N, F]
    src: jax.Array,  # [E] int32 global ids
    dst: jax.Array,  # [E] int32 global ids, sorted
    weight: jax.Array | None,  # [E] f32 or None
    estarts: jax.Array,  # [N/128 + 1] int32
    num_nodes: int,
    *,
    block_edges: int = 512,
    interpret: bool = False,
    program_rows: int | None = None,
) -> jax.Array:
    n, f = x.shape
    assert n % BLOCK_ROWS == 0 and num_nodes == n, (
        "block-local spmm requires x padded to the 128-row grid")
    # Grid programs span several 128-row blocks: per-program fixed cost
    # (DMA setup/waits, x/out block moves) dominates at avg ~450 edges per
    # 128-row block (measured ~2us/program -> 7.5 ms/layer at config #4),
    # while block-locality holds within any aligned superblock for free.
    # Wider programs trade one-hot FLOPs (LINEAR in program_rows: each edge
    # chunk does two [block_edges, pr] dots) for per-program overhead.
    # 512 is the measured sweet spot: an interleaved in-process A/B on
    # config #4 (F=128) had 512 beating both 256 and 1024 in 3 of 4 rounds,
    # and DrugBank (F=64) showed 256 vs 512 within noise. All timings
    # sync-honest (forced D2H; block_until_ready is unreliable over the
    # axon tunnel).
    if program_rows is None:
        program_rows = 512
    program_rows = min(program_rows, _round_up(n, 128))
    n_pad = _round_up(n, program_rows)
    if n_pad != n:
        x = jnp.concatenate([x, jnp.zeros((n_pad - n, f), x.dtype)])
    # coarsen the 128-granular estarts to program granularity
    s = program_rows // BLOCK_ROWS
    nblk = n_pad // BLOCK_ROWS
    if estarts.shape[0] < nblk + 1:
        estarts = jnp.concatenate([
            estarts,
            jnp.broadcast_to(estarts[-1:], (nblk + 1 - estarts.shape[0],)),
        ])
    estarts = estarts[::s]
    grid = n_pad // program_rows
    f_pad = _round_up(f, 128)
    if f_pad != f:
        x = jnp.zeros((n_pad, f_pad), x.dtype).at[:, :f].set(x)
    n = n_pad
    e = src.shape[0]
    e_pad = _round_up(e, 128)
    block_edges = min(block_edges, e_pad)
    if e_pad != e:
        src = jnp.concatenate([src, jnp.zeros(e_pad - e, jnp.int32) + n])
        dst = jnp.concatenate([dst, jnp.zeros(e_pad - e, jnp.int32) + n])
        if weight is not None:
            weight = jnp.concatenate([weight, jnp.zeros(e_pad - e, weight.dtype)])

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
            w_ref, x_ref, out_ref, sb, db, wb, ss, ds_, ws = rest
        else:
            x_ref, out_ref, sb, db, ss, ds_ = rest
            w_ref = wb = ws = None
        _block_spmm_kernel(
            estarts_ref, src_ref, dst_ref, w_ref, x_ref, out_ref,
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
    in_specs.append(
        pl.BlockSpec((program_rows, f_pad), lambda i, *_: (i, 0),
                     memory_space=pltpu.VMEM))
    inputs.append(x)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (program_rows, f_pad), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[s for s in scratch if s is not None],
        ),
        out_shape=out_struct((n, f_pad), x.dtype, estarts, *inputs),
        interpret=interpret,
    )(estarts.astype(jnp.int32), *inputs)
    return out[:num_nodes, :f]


def block_estarts(dst: jax.Array, num_nodes: int) -> jax.Array:
    """[N/128 + 1] edge range per 128-row block from the sorted dst ids."""
    bounds = jnp.arange(0, num_nodes + 1, BLOCK_ROWS, dtype=jnp.int32)
    return jnp.searchsorted(dst.astype(jnp.int32), bounds, side="left").astype(
        jnp.int32)


# ---------------------------------------------------------------------------
# differentiable wrapper
# ---------------------------------------------------------------------------


def block_spmm(
    x: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    weight: jax.Array | None,
    estarts: jax.Array,
    tsrc: jax.Array,
    tdst: jax.Array,
    tweight: jax.Array | None,
    tstarts: jax.Array,
    num_nodes: int,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable block-local SpMM.

    (tsrc, tdst, tweight, tstarts) describe the TRANSPOSED edge list (sorted
    by original src) used by the backward pass; for the symmetric molecule
    graphs of this model family they share the block-local property.
    """
    if weight is None:
        return _block_spmm_unw(x, src, dst, estarts, tsrc, tdst, tstarts,
                               num_nodes, interpret)
    return _block_spmm_w(x, src, dst, weight, estarts, tsrc, tdst, tweight,
                         tstarts, num_nodes, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _block_spmm_unw(x, src, dst, estarts, tsrc, tdst, tstarts, num_nodes,
                    interpret):
    return _block_spmm_impl(x, src, dst, None, estarts, num_nodes,
                            interpret=interpret)


def _block_spmm_unw_fwd(x, src, dst, estarts, tsrc, tdst, tstarts, num_nodes,
                        interpret):
    out = _block_spmm_impl(x, src, dst, None, estarts, num_nodes,
                           interpret=interpret)
    return out, (src, dst, estarts, tsrc, tdst, tstarts)


def _block_spmm_unw_bwd(num_nodes, interpret, res, g):
    src, dst, estarts, tsrc, tdst, tstarts = res
    d_x = _block_spmm_impl(g, tsrc, tdst, None, tstarts, num_nodes,
                           interpret=interpret)
    return d_x.astype(g.dtype), None, None, None, None, None, None


_block_spmm_unw.defvjp(_block_spmm_unw_fwd, _block_spmm_unw_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _block_spmm_w(x, src, dst, weight, estarts, tsrc, tdst, tweight, tstarts,
                  num_nodes, interpret):
    return _block_spmm_impl(x, src, dst, weight, estarts, num_nodes,
                            interpret=interpret)


def _block_spmm_w_fwd(x, src, dst, weight, estarts, tsrc, tdst, tweight,
                      tstarts, num_nodes, interpret):
    out = _block_spmm_impl(x, src, dst, weight, estarts, num_nodes,
                           interpret=interpret)
    return out, (x, src, dst, weight, estarts, tsrc, tdst, tweight, tstarts)


def _block_spmm_w_bwd(num_nodes, interpret, res, g):
    x, src, dst, weight, estarts, tsrc, tdst, tweight, tstarts = res
    d_x = _block_spmm_impl(g, tsrc, tdst, tweight, tstarts, num_nodes,
                           interpret=interpret)
    # d_w via two gathers + per-edge dot (padding rows: dst == N -> zero)
    g_e = jnp.take(g, dst, axis=0, mode="clip")
    g_e = jnp.where((dst < num_nodes)[:, None], g_e, 0.0)
    d_w = jnp.sum(g_e * jnp.take(x, src, axis=0, mode="clip"), axis=-1)
    return (d_x.astype(x.dtype), None, None, d_w.astype(weight.dtype),
            None, None, None, None, None)


_block_spmm_w.defvjp(_block_spmm_w_fwd, _block_spmm_w_bwd)
