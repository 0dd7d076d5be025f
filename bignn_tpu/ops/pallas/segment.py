"""Pallas TPU sorted-segment reductions (SURVEY.md T2, §2.2 N1/N3).

Why this kernel exists: XLA lowers ``segment_sum`` to scatter-add, which TPU
executes quasi-serially — measured 57 GB/s effective at E=10M, F=128 on v5e
vs ~512 GB/s for a streaming op (scratch/tpu_micro.py). Since our layout
contract guarantees *sorted* segment ids (sparse/formats.py), segmentation is
a contiguous partition of the edge axis, and the scatter disappears:

  * grid over output row blocks of BR rows; block i owns segments
    [i*BR, (i+1)*BR) exclusively — no cross-block accumulation, no carry;
  * the edge range of each block ([starts[i], starts[i+1])) is precomputed
    with one jnp.searchsorted outside the kernel and scalar-prefetched;
  * edges stream HBM→VMEM in double-buffered chunks of BE; the in-block
    "scatter" is a one-hot matmul on the MXU:
        acc += onehot(seg - i*BR) @ chunk
    whose masking also absorbs all boundary sloppiness: chunk reads are
    clamped/aligned to DMA-legal offsets, and any over-read edges (previous
    block's tail, next block's head, already-counted rows after clamping)
    simply produce all-zero one-hot rows.

Layout requirements (Mosaic DMA slicing rules):
  * feature dim must be a multiple of 128 lanes — the wrapper pads when
    needed (model dims should be 128-multiples to avoid the copy);
  * edge count must be a multiple of 8 sublanes and >= one chunk — the
    framework's formats guarantee edge_cap % 8 == 0, so the fast path takes
    no padding copy at all.

``segment_softmax`` composes XLA segment-max (small [E, H] arrays) with this
kernel for the exp-sum — profiling showed the sum is where scatter cost
lives; max over H<=8 heads is minor traffic.
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


# ---------------------------------------------------------------------------
# segment_sum
# ---------------------------------------------------------------------------


def _segment_sum_kernel(
    starts_ref,  # [G+1] int32, scalar prefetch: edge range per row block
    data_ref,  # [E, F] HBM
    seg_ref,  # [1, E] int32 HBM
    out_ref,  # [BR, F] VMEM (block i -> rows [i*BR, (i+1)*BR))
    data_buf,  # [2, BE, F] VMEM scratch
    seg_buf,  # [2, 1, BE] int32 VMEM scratch
    data_sem,
    seg_sem,
    *,
    block_rows: int,
    block_edges: int,
    num_edges: int,  # static total E (multiple of 8, >= block_edges)
):
    i = pl.program_id(0)
    e0 = starts_ref[i]
    e1 = starts_ref[i + 1]
    # Align the range start down to the 128-edge DMA granule (Mosaic requires
    # provably 128-divisible lane offsets for the seg array, 8-divisible
    # sublane offsets for data). Over-read rows are masked by the one-hot.
    e0_al = (e0 // 128) * 128
    n_chunks = pl.cdiv(e1 - e0_al, block_edges)
    row0 = i * block_rows
    max_start = num_edges - block_edges

    def chunk_dma(slot, c):
        intended = e0_al + c * block_edges
        s = jnp.minimum(intended, max_start)  # stay in bounds; mask re-reads
        s = pl.multiple_of(s, 128)
        return (
            pltpu.make_async_copy(
                data_ref.at[pl.ds(s, block_edges), :],
                data_buf.at[slot],
                data_sem.at[slot],
            ),
            pltpu.make_async_copy(
                seg_ref.at[:, pl.ds(s, block_edges)],
                seg_buf.at[slot],
                seg_sem.at[slot],
            ),
        )

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
        shift = intended - s  # rows < shift were already counted earlier
        seg = seg_buf[slot]  # [1, BE]
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_rows, block_edges), 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (block_rows, block_edges), 1)
        onehot = ((seg - row0 == rows) & (lanes >= shift)).astype(jnp.float32)
        chunk = data_buf[slot].astype(jnp.float32)  # [BE, F]
        # HIGHEST: the kernel is DMA-bound, so the extra MXU passes are free
        # and keep the one-hot product at true f32 accuracy (a 0/1 matrix
        # times f32 rows must not round through bf16).
        return acc + jax.lax.dot(
            onehot, chunk,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    acc = jnp.zeros((block_rows, out_ref.shape[1]), jnp.float32)
    acc = jax.lax.fori_loop(0, n_chunks, body, acc)
    out_ref[:] = acc.astype(out_ref.dtype)


def segment_sum_pallas(
    data: jax.Array,  # [E, F] (or [E])
    segment_ids: jax.Array,  # [E] int sorted ascending; >= num_segments = dropped
    num_segments: int,
    *,
    block_rows: int = 128,
    block_edges: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Sorted segment sum; drop-in for jax.ops.segment_sum with sorted ids.

    Differentiable: the VJP of a segment sum is a row gather of the cotangent
    (XLA take — measured at HBM speed of light), with dropped (out-of-range)
    ids receiving zero gradient.
    """
    return _segment_sum_vjp(
        data, segment_ids, num_segments, block_rows, block_edges, interpret
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _segment_sum_vjp(data, segment_ids, num_segments, block_rows, block_edges,
                     interpret):
    return _segment_sum_impl(
        data, segment_ids, num_segments,
        block_rows=block_rows, block_edges=block_edges, interpret=interpret,
    )


def _segment_sum_fwd(data, segment_ids, num_segments, block_rows, block_edges,
                     interpret):
    out = _segment_sum_impl(
        data, segment_ids, num_segments,
        block_rows=block_rows, block_edges=block_edges, interpret=interpret,
    )
    return out, segment_ids


def _segment_sum_bwd(num_segments, block_rows, block_edges, interpret,
                     segment_ids, g):
    squeeze = g.ndim == 1
    g2 = g[:, None] if squeeze else g
    d = jnp.take(g2, segment_ids, axis=0, mode="clip")
    d = jnp.where((segment_ids < num_segments)[:, None], d, 0.0)
    return (d[:, 0] if squeeze else d, None)


_segment_sum_vjp.defvjp(_segment_sum_fwd, _segment_sum_bwd)


@functools.partial(
    jax.jit, static_argnames=("num_segments", "block_rows", "block_edges", "interpret")
)
def _segment_sum_impl(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    block_rows: int = 128,
    block_edges: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    if data.ndim == 1:
        return _segment_sum_impl(
            data[:, None], segment_ids, num_segments,
            block_rows=block_rows, block_edges=block_edges, interpret=interpret,
        )[:, 0]
    e, f = data.shape
    n_pad = _round_up(num_segments, block_rows)
    grid = n_pad // block_rows

    # fast path: no data copies when the layout contract already holds
    # (feature dim and edge count both multiples of the 128 DMA granule —
    # sparse/formats.py guarantees the edge count)
    f_pad = _round_up(f, 128)
    e_pad = _round_up(e, 128)
    block_edges = min(block_edges, e_pad)  # both multiples of 128
    if f_pad != f or e_pad != e:
        data = jnp.zeros((e_pad, f_pad), data.dtype).at[:e, :f].set(data)
    seg_p = jnp.full((e_pad,), n_pad, jnp.int32).at[:e].set(
        jnp.minimum(segment_ids.astype(jnp.int32), n_pad)
    )
    block_bounds = jnp.arange(0, n_pad + 1, block_rows, dtype=jnp.int32)
    starts = jnp.searchsorted(seg_p, block_bounds, side="left").astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(
            _segment_sum_kernel,
            block_rows=block_rows,
            block_edges=block_edges,
            num_edges=e_pad,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # data stays in HBM
                pl.BlockSpec(memory_space=pl.ANY),  # seg stays in HBM
            ],
            out_specs=pl.BlockSpec(
                (block_rows, f_pad), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, block_edges, f_pad), data.dtype),
                pltpu.VMEM((2, 1, block_edges), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=out_struct((n_pad, f_pad), data.dtype, starts, data, seg_p),
        interpret=interpret,
    )(starts, data, seg_p[None, :])
    return out[:num_segments, :f]


# ---------------------------------------------------------------------------
# segment_softmax (hybrid: XLA max + Pallas exp-sum)
# ---------------------------------------------------------------------------


def segment_softmax_pallas(
    scores: jax.Array,  # [E] or [E, H]
    segment_ids: jax.Array,
    num_segments: int,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Sorted-segment softmax with an analytic custom VJP.

    Forward: the scatter-heavy piece (the exp-sum denominator) runs on the
    Pallas segment-sum kernel; the per-segment max — small [E, H<=8]
    traffic — stays on XLA segment_max. Padding rows (id >= num_segments)
    produce exactly 0.

    Backward: the naive AD of ``expd / denom[ids]`` scatters through the
    denominator gather (unsorted scatter HLO, ~hundreds of ms at 500K edges
    on TPU). The standard softmax jacobian needs none of that:
        d_scores = alpha * g  -  alpha * segsum(alpha * g)[ids]
    one sorted segment-sum + one gather.
    """
    return _segment_softmax_vjp(scores, segment_ids, num_segments, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _segment_softmax_vjp(scores, segment_ids, num_segments, interpret):
    return _segment_softmax_fwd_impl(scores, segment_ids, num_segments,
                                     interpret)


def _segment_softmax_fwd(scores, segment_ids, num_segments, interpret):
    alpha = _segment_softmax_fwd_impl(scores, segment_ids, num_segments,
                                      interpret)
    return alpha, (alpha, segment_ids)


def _segment_softmax_bwd(num_segments, interpret, res, g):
    alpha, segment_ids = res
    squeeze = alpha.ndim == 1
    a = alpha[:, None] if squeeze else alpha
    gg = g[:, None] if g.ndim == 1 else g
    t = a * gg
    s = segment_sum_pallas(t, segment_ids, num_segments, interpret=interpret)
    d = t - a * jnp.take(s, segment_ids, axis=0, mode="clip")
    return (d[:, 0] if squeeze else d).astype(alpha.dtype), None


_segment_softmax_vjp.defvjp(_segment_softmax_fwd, _segment_softmax_bwd)


def _segment_softmax_fwd_impl(
    scores: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    interpret: bool = False,
) -> jax.Array:
    squeeze = scores.ndim == 1
    if squeeze:
        scores = scores[:, None]
    # XLA segment-max for the shift: measured faster in-context than the
    # transposed Pallas max at model scale (the transpose relayout costs more
    # than the scatter-max saves at E~300K, H<=8); softmax is shift-invariant
    # so stop_gradient removes the entire max backward pass either way.
    seg_max = jax.ops.segment_max(
        jax.lax.stop_gradient(scores), segment_ids,
        num_segments=num_segments, indices_are_sorted=True,
    )
    seg_max = jax.lax.stop_gradient(jnp.where(jnp.isfinite(seg_max), seg_max, 0.0))
    shifted = scores - jnp.take(seg_max, segment_ids, axis=0, mode="clip")
    # out-of-range (padding) rows get exp(-inf) = 0 -> defined zero output
    in_range = (segment_ids < num_segments)[:, None]
    expd = jnp.where(in_range, jnp.exp(shifted), 0.0)
    denom = segment_sum_pallas(expd, segment_ids, num_segments, interpret=interpret)
    out = expd / jnp.maximum(jnp.take(denom, segment_ids, axis=0, mode="clip"), 1e-16)
    return out[:, 0] if squeeze else out


# ---------------------------------------------------------------------------
# segment_max (transposed layout: scores travel as [H, E], lanes = edges)
# ---------------------------------------------------------------------------


def _segment_max_kernel(
    starts_ref,  # [G+1] int32 scalar prefetch
    scores_ref,  # [H, E] HBM (transposed)
    seg_ref,  # [1, E] int32 HBM
    out_ref,  # [BR, H] VMEM
    score_buf,  # [2, H, BE] VMEM
    seg_buf,  # [2, 1, BE] int32 VMEM
    score_sem,
    seg_sem,
    *,
    block_rows: int,
    block_edges: int,
    num_edges: int,
    heads: int,
):
    i = pl.program_id(0)
    e0 = starts_ref[i]
    e1 = starts_ref[i + 1]
    e0_al = (e0 // 128) * 128
    n_chunks = pl.cdiv(e1 - e0_al, block_edges)
    row0 = i * block_rows
    max_start = num_edges - block_edges
    neg = jnp.float32(-3.0e38)

    def chunk_dma(slot, c):
        intended = e0_al + c * block_edges
        s = jnp.minimum(intended, max_start)
        s = pl.multiple_of(s, 128)
        return (
            pltpu.make_async_copy(
                scores_ref.at[:, pl.ds(s, block_edges)],
                score_buf.at[slot],
                score_sem.at[slot],
            ),
            pltpu.make_async_copy(
                seg_ref.at[:, pl.ds(s, block_edges)],
                seg_buf.at[slot],
                seg_sem.at[slot],
            ),
        )

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
        seg = seg_buf[slot]  # [1, BE]
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_rows, block_edges), 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (block_rows, block_edges), 1)
        oh = (seg - row0 == rows) & (lanes >= shift)  # [BR, BE] bool
        cols = []
        for h in range(heads):
            sc_h = score_buf[slot][h, :].astype(jnp.float32).reshape(1, block_edges)
            masked = jnp.where(oh, sc_h, neg)
            cols.append(jnp.max(masked, axis=1, keepdims=True))  # [BR, 1]
        return jnp.maximum(acc, jnp.concatenate(cols, axis=1))

    acc = jnp.full((block_rows, heads), neg, jnp.float32)
    acc = jax.lax.fori_loop(0, n_chunks, body, acc)
    # empty segments -> 0 (matches ops.segment.segment_max contract)
    out_ref[:] = jnp.where(acc <= neg * 0.5, 0.0, acc).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_segments", "block_rows", "block_edges", "interpret")
)
def segment_max_pallas(
    scores: jax.Array,  # [E] or [E, H]
    segment_ids: jax.Array,
    num_segments: int,
    *,
    block_rows: int = 128,
    block_edges: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Sorted segment max; empty segments give 0. Scatter-free: scores are
    transposed to [H, E] so edge chunks slice the (128-aligned) lane axis —
    no lane-padding of small head dims, no scatter-max HLO."""
    squeeze = scores.ndim == 1
    if squeeze:
        scores = scores[:, None]
    e, h = scores.shape
    n_pad = _round_up(num_segments, block_rows)
    grid = n_pad // block_rows
    e_pad = _round_up(e, 128)
    block_edges = min(block_edges, e_pad)
    scores_t = jnp.full((h, e_pad), -3.0e38, scores.dtype).at[:, :e].set(scores.T)
    seg_p = jnp.full((e_pad,), n_pad, jnp.int32).at[:e].set(
        jnp.minimum(segment_ids.astype(jnp.int32), n_pad)
    )
    block_bounds = jnp.arange(0, n_pad + 1, block_rows, dtype=jnp.int32)
    starts = jnp.searchsorted(seg_p, block_bounds, side="left").astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(
            _segment_max_kernel,
            block_rows=block_rows,
            block_edges=block_edges,
            num_edges=e_pad,
            heads=h,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (block_rows, h), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, h, block_edges), scores.dtype),
                pltpu.VMEM((2, 1, block_edges), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=out_struct((n_pad, h), scores.dtype, starts, scores_t, seg_p),
        interpret=interpret,
    )(starts, scores_t, seg_p[None, :])
    out = out[:num_segments]
    return out[:, 0] if squeeze else out


def segment_max_pallas_vjp(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable segment max (cotangent split evenly among ties)."""
    return _segment_max_diff(data, segment_ids, num_segments, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _segment_max_diff(data, segment_ids, num_segments, interpret):
    return segment_max_pallas(data, segment_ids, num_segments, interpret=interpret)


def _segment_max_diff_fwd(data, segment_ids, num_segments, interpret):
    out = segment_max_pallas(data, segment_ids, num_segments, interpret=interpret)
    return out, (data, segment_ids, out)


def _segment_max_diff_bwd(num_segments, interpret, res, g):
    data, segment_ids, out = res
    squeeze = data.ndim == 1
    d2 = data[:, None] if squeeze else data
    o2 = out[:, None] if out.ndim == 1 else out
    g2 = g[:, None] if g.ndim == 1 else g
    in_range = (segment_ids < num_segments)[:, None]
    is_max = in_range & (d2 == jnp.take(o2, segment_ids, axis=0, mode="clip"))
    cnt = segment_sum_pallas(
        is_max.astype(jnp.float32), segment_ids, num_segments, interpret=interpret
    )
    share = jnp.take(g2 / jnp.maximum(cnt, 1.0), segment_ids, axis=0, mode="clip")
    d_data = jnp.where(is_max, share, 0.0)
    return (d_data[:, 0] if squeeze else d_data, None)


_segment_max_diff.defvjp(_segment_max_diff_fwd, _segment_max_diff_bwd)
