"""Multi-head weighted aggregation: out[d,h] = sum_e alpha[e,h] * v[src_e,h]
(SURVEY.md §2.2 N3 — the GAT/DotAttn message aggregation).

One op instead of per-head SpMM calls so the feature axis stays H*D wide
(lane-efficient for the Pallas kernel) and the backward reuses the
sort-to-sorted-segment-sum trick from ops/pallas/spmm.py, including the
attention-weight gradient d_alpha as a fused per-edge dot. As there, a
host-precomputed ``src_perm``/``src_sorted`` removes the per-step argsort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bignn_tpu.ops.dispatch import get_backend
from bignn_tpu.ops.gather import gather_rows
from bignn_tpu.ops.segment import segment_sum


def spmm_multihead(
    v: jax.Array,  # [N, H, D] per-head values
    src: jax.Array,  # [E]
    dst: jax.Array,  # [E] sorted
    alpha: jax.Array,  # [E, H] per-edge per-head weights
    num_out: int,
    *,
    src_perm: jax.Array | None = None,
    src_sorted: jax.Array | None = None,
    backend: str | None = None,
) -> jax.Array:
    """Returns [num_out, H, D]."""
    b = get_backend(backend)
    if b in ("pallas", "pallas_interpret"):
        if (src_perm is None) != (src_sorted is None):
            raise ValueError("src_perm and src_sorted must be passed together")
        if src_perm is None:
            src_perm = jnp.zeros((0,), jnp.int32)
            src_sorted = jnp.zeros((0,), jnp.int32)
        n, h, d = v.shape
        out = _spmm_mh_vjp(
            v, src, dst, alpha, src_perm, src_sorted, num_out,
            b == "pallas_interpret",
        )
        return out.reshape(num_out, h, d)
    msgs = gather_rows(v, src) * alpha[:, :, None]
    n, h, d = v.shape
    agg = segment_sum(msgs.reshape(-1, h * d), dst, num_out, backend="xla")
    return agg.reshape(num_out, h, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _spmm_mh_vjp(v, src, dst, alpha, src_perm, src_sorted, num_out, interpret):
    return _mh_forward(v, src, dst, alpha, num_out, interpret)


def _mh_forward(v, src, dst, alpha, num_out, interpret):
    from bignn_tpu.ops.pallas.segment import segment_sum_pallas

    n, h, d = v.shape
    msgs = jnp.take(v, src, axis=0, mode="clip") * alpha[:, :, None]
    return segment_sum_pallas(
        msgs.reshape(-1, h * d), dst, num_out, interpret=interpret
    )


def _mh_fwd(v, src, dst, alpha, src_perm, src_sorted, num_out, interpret):
    out = _mh_forward(v, src, dst, alpha, num_out, interpret)
    return out, (v, src, dst, alpha, src_perm, src_sorted)


def _mh_bwd(num_out, interpret, res, g):
    from bignn_tpu.ops.pallas.segment import segment_sum_pallas

    v, src, dst, alpha, src_perm, src_sorted = res
    n, h, d = v.shape
    g3 = g.reshape(num_out, h, d)
    g_e = jnp.take(g3, dst, axis=0, mode="clip")  # [E, H, D]
    g_e = jnp.where((dst < num_out)[:, None, None], g_e, 0.0)
    v_e = jnp.take(v, src, axis=0, mode="clip")
    d_alpha = jnp.sum(g_e * v_e, axis=-1)  # [E, H]
    m = (g_e * alpha[:, :, None]).reshape(-1, h * d)
    if src_perm.shape[0] == 0:
        src_perm = jnp.argsort(src)
        src_sorted = jnp.take(src, src_perm)
    d_v = segment_sum_pallas(
        jnp.take(m, src_perm, axis=0), src_sorted, n, interpret=interpret
    ).reshape(n, h, d)
    return (d_v.astype(v.dtype), None, None, d_alpha.astype(alpha.dtype),
            None, None)


_spmm_mh_vjp.defvjp(_mh_fwd, _mh_bwd)
