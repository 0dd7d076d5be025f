"""Row gather (SURVEY.md §2.2 N4: replaces ATen index_select).

Used for: source-node lookup in message passing, endpoint-embedding lookup
for edge scoring / negative sampling (SURVEY.md §3.2 SCORING), and the
per-edge score lookups of attention convs.

``gather_rows`` is the plain forward op (XLA's gather is near-optimal on
TPU). Its *AD backward*, however, is an unsorted scatter-add — measured
~250 ms for 500K x 4 rows on v5e (TPU scatter serializes). When the caller
can supply the sorted-scatter plan (ids already sorted, or a precomputed
source-sort permutation), ``gather_rows_sorted_grad`` routes the backward
through the Pallas sorted-segment-sum kernel instead: zero scatters.
"""

from __future__ import annotations

import functools

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


def gather_rows_sorted_grad(
    table: jax.Array,  # [N, ...]
    indices: jax.Array,  # [E] — ids >= N are padding (zero gradient)
    *,
    perm: jax.Array | None = None,  # argsort(indices) if indices unsorted
    ids_sorted: jax.Array | None = None,  # indices[perm]
    backend: str | None = None,
) -> jax.Array:
    """Gather whose backward is a SORTED segment-sum (no scatter HLO).

    ``indices`` must either be sorted ascending, or ``perm``/``ids_sorted``
    must give its sorting permutation (static per graph — the same arrays
    the SpMM backward uses). Falls back to plain AD on the XLA backend.
    """
    b = get_backend(backend)
    if b not in ("pallas", "pallas_interpret"):
        return jnp.take(table, indices, axis=0, mode="clip")
    if (perm is None) != (ids_sorted is None):
        raise ValueError("perm and ids_sorted must be passed together")
    if perm is None:
        perm = jnp.zeros((0,), jnp.int32)
        ids_sorted = jnp.zeros((0,), jnp.int32)
    return _gather_sorted_vjp(table, indices, perm, ids_sorted,
                              b == "pallas_interpret")


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _gather_sorted_vjp(table, indices, perm, ids_sorted, interpret):
    return jnp.take(table, indices, axis=0, mode="clip")


def _gather_sorted_fwd(table, indices, perm, ids_sorted, interpret):
    out = jnp.take(table, indices, axis=0, mode="clip")
    return out, (table.shape[0], indices, perm, ids_sorted)


def _gather_sorted_bwd(interpret, res, g):
    from bignn_tpu.ops.pallas.segment import segment_sum_pallas

    n, indices, perm, ids_sorted = res
    if perm.shape[0] == 0:
        m, ids = g, indices
    else:
        m, ids = jnp.take(g, perm, axis=0), ids_sorted
    squeeze = m.ndim == 1
    if squeeze:
        m = m[:, None]
    d = segment_sum_pallas(m, ids, n, interpret=interpret)
    if squeeze:
        d = d[:, 0]
    return d.astype(g.dtype), None, None, None


_gather_sorted_vjp.defvjp(_gather_sorted_fwd, _gather_sorted_bwd)


def permutation_scatter_rows(values: jax.Array, idx: jax.Array) -> jax.Array:
    """``out[idx[j]] = values[j]`` for a *permutation* ``idx`` — scatter-free.

    ``idx`` must be a permutation of ``range(len(values))`` (every output row
    written exactly once). Because the map is a bijection, the scatter is
    exactly a gather by the inverse permutation: forward is
    ``values[argsort(idx)]`` and the VJP is ``g[idx]`` — both row gathers, so
    neither direction emits a TPU scatter HLO (which serializes; see module
    docstring). Used by ``BiGNN.embed_drugs`` to place bucket embeddings into
    the [num_drugs, d] matrix (SURVEY.md §3.2 step 1)."""
    return _perm_scatter(values, idx)


@jax.custom_vjp
def _perm_scatter(values, idx):
    return jnp.take(values, jnp.argsort(idx), axis=0)


def _perm_scatter_fwd(values, idx):
    return _perm_scatter(values, idx), idx


def _perm_scatter_bwd(idx, g):
    return jnp.take(g, idx, axis=0), None


_perm_scatter.defvjp(_perm_scatter_fwd, _perm_scatter_bwd)
