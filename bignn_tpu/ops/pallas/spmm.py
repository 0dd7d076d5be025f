"""SpMM on the pallas backend (SURVEY.md T2, §2.2 N2).

Measured on v5e (scratch/tpu_micro.py, E=10M, F=128):
  * XLA row gather ``x[src]`` already runs at HBM speed-of-light
    (319 GB/s read + write ≈ 640 GB/s total) — no kernel needed there;
  * XLA sorted segment_sum runs at 57 GB/s (scatter-add serialization) —
    replaced by the Pallas one-hot-MXU segment-sum kernel (396 GB/s);
  * the *backward* of the gather is an unsorted scatter-add (33-57 GB/s in
    XLA). The custom VJP below replaces it too: permute the per-edge
    cotangents into source-sorted order (one gather, HBM-bound) and run the
    same Pallas sorted-segment-sum over ``src``.

The source-sort permutation is static for a fixed (padded) edge list, so
callers that know the graph ahead of time pass it in precomputed
(``src_perm``/``src_sorted`` — sparse/formats.py builds them on host) and the
backward contains **no device sort at all**. Without them the kernel falls
back to ``argsort(src)`` per step (XLA CSE still dedups it across layers).
"""

from __future__ import annotations

import functools

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
    src_perm: jax.Array | None = None,  # [E] int32: argsort(src), host-built
    src_sorted: jax.Array | None = None,  # [E] int32: src[src_perm]
    interpret: bool = False,
) -> jax.Array:
    if (src_perm is None) != (src_sorted is None):
        raise ValueError("src_perm and src_sorted must be passed together")
    if src_perm is None:
        # sentinel zeros keep the custom_vjp signature static; flag selects
        src_perm = jnp.zeros((0,), jnp.int32)
        src_sorted = jnp.zeros((0,), jnp.int32)
    if weight is None:
        return _spmm_unweighted(x, src, dst, src_perm, src_sorted, num_out, interpret)
    return _spmm_weighted(x, src, dst, weight, src_perm, src_sorted, num_out, interpret)


def _forward(x, src, dst, weight, num_out, interpret):
    msgs = jnp.take(x, src, axis=0, mode="clip")
    if weight is not None:
        msgs = msgs * weight[:, None].astype(msgs.dtype)
    return segment_sum_pallas(msgs, dst, num_out, interpret=interpret)


def _masked_cotangent(g, dst, num_out):
    """Per-edge cotangent rows; padded edges (dst out of range) get zero."""
    g_e = jnp.take(g, dst, axis=0, mode="clip")
    return jnp.where((dst < num_out)[:, None], g_e, 0.0)


def _dx_sorted(m, src, src_perm, src_sorted, num_src, interpret):
    """d_x = scatter-add of m at src — done as (permute to source-sorted
    order) + sorted-segment-sum. The permutation is precomputed when given,
    otherwise argsort'd on device."""
    if src_perm.shape[0] == 0:
        src_perm = jnp.argsort(src)
        src_sorted = jnp.take(src, src_perm)
    return segment_sum_pallas(
        jnp.take(m, src_perm, axis=0),
        src_sorted,
        num_src,
        interpret=interpret,
    )


# ---- weighted --------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _spmm_weighted(x, src, dst, weight, src_perm, src_sorted, num_out, interpret):
    return _forward(x, src, dst, weight, num_out, interpret)


def _spmm_weighted_fwd(x, src, dst, weight, src_perm, src_sorted, num_out, interpret):
    out = _forward(x, src, dst, weight, num_out, interpret)
    return out, (x, src, dst, weight, src_perm, src_sorted)


def _spmm_weighted_bwd(num_out, interpret, res, g):
    x, src, dst, weight, src_perm, src_sorted = res
    g_e = _masked_cotangent(g, dst, num_out)
    d_w = jnp.sum(g_e * jnp.take(x, src, axis=0, mode="clip"), axis=-1)
    m = g_e * weight[:, None].astype(g_e.dtype)
    d_x = _dx_sorted(m, src, src_perm, src_sorted, x.shape[0], interpret)
    return d_x.astype(x.dtype), None, None, d_w.astype(weight.dtype), None, None


_spmm_weighted.defvjp(_spmm_weighted_fwd, _spmm_weighted_bwd)


# ---- unweighted ------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _spmm_unweighted(x, src, dst, src_perm, src_sorted, num_out, interpret):
    return _forward(x, src, dst, None, num_out, interpret)


def _spmm_unweighted_fwd(x, src, dst, src_perm, src_sorted, num_out, interpret):
    out = _forward(x, src, dst, None, num_out, interpret)
    return out, (x, src, dst, src_perm, src_sorted)


def _spmm_unweighted_bwd(num_out, interpret, res, g):
    x, src, dst, src_perm, src_sorted = res
    m = _masked_cotangent(g, dst, num_out)
    d_x = _dx_sorted(m, src, src_perm, src_sorted, x.shape[0], interpret)
    return d_x.astype(x.dtype), None, None, None, None


_spmm_unweighted.defvjp(_spmm_unweighted_fwd, _spmm_unweighted_bwd)
