"""Multi-head weighted aggregation: out[d,h] = sum_e alpha[e,h] * v[src_e,h]
(SURVEY.md §2.2 N3 — the GAT/DotAttn message aggregation).

One op instead of per-head SpMM calls so the feature axis stays H*D wide
(lane-efficient for the Pallas kernel) and the backward reuses the
sort-to-sorted-segment-sum trick from ops/pallas/spmm.py, including the
attention-weight gradient d_alpha as a fused per-edge dot. As there, a
host-precomputed ``src_perm``/``src_sorted`` removes the per-step argsort.

LAYOUT (r5): every per-edge tensor lives in the FLAT [E, H*D] layout.
The r4 implementation gathered [E, H, D] (D = 32), whose TPU tile
T(4,128) pads the 32-lane minor dim 4x — at config-#4 full-graph scale
(16.1M directed outer edges) the fwd+bwd gathers alone cost 2 x 6.14 GB
of which 75% was padding (measured in the graph=1 OOM dump,
docs/P2_SCALE_r5.txt). [E, H*D] = [E, 128] tiles pad-free; the per-head
alpha broadcast and the d_alpha per-head reduction are expressed so no
[E, H, D]-shaped VALUE exists (broadcast+reshape fuse into the multiply;
d_alpha reduces per-head lane slices of the flat product).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bignn_tpu.ops.dispatch import get_backend
from bignn_tpu.ops.gather import gather_rows
from bignn_tpu.ops.segment import segment_sum


def _alpha_wide(alpha: jax.Array, d: int, dtype) -> jax.Array:
    """[E, H] -> [E, H*D] per-head broadcast, fusable (no 3D gather)."""
    e, h = alpha.shape
    return jnp.broadcast_to(
        alpha[:, :, None], (e, h, d)).reshape(e, h * d).astype(dtype)


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
    n, h, d = v.shape
    if b in ("pallas", "pallas_interpret"):
        if (src_perm is None) != (src_sorted is None):
            raise ValueError("src_perm and src_sorted must be passed together")
        if src_perm is None:
            src_perm = jnp.zeros((0,), jnp.int32)
            src_sorted = jnp.zeros((0,), jnp.int32)
        out = _spmm_mh_vjp(
            v, src, dst, alpha, src_perm, src_sorted, num_out,
            b == "pallas_interpret",
        )
        return out.reshape(num_out, h, d)
    v2 = v.reshape(n, h * d)
    msgs = gather_rows(v2, src) * _alpha_wide(alpha, d, v2.dtype)
    agg = segment_sum(msgs, dst, num_out, backend="xla")
    return agg.reshape(num_out, h, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _spmm_mh_vjp(v, src, dst, alpha, src_perm, src_sorted, num_out, interpret):
    return _mh_forward(v, src, dst, alpha, num_out, interpret)


def _mh_forward(v, src, dst, alpha, num_out, interpret):
    from bignn_tpu.ops.pallas.segment import segment_sum_pallas

    n, h, d = v.shape
    v2 = v.reshape(n, h * d)
    msgs = (jnp.take(v2, src, axis=0, mode="clip")
            * _alpha_wide(alpha, d, v2.dtype))
    return segment_sum_pallas(msgs, dst, num_out, interpret=interpret)


def _mh_fwd(v, src, dst, alpha, src_perm, src_sorted, num_out, interpret):
    out = _mh_forward(v, src, dst, alpha, num_out, interpret)
    return out, (v, src, dst, alpha, src_perm, src_sorted)


def _mh_bwd(num_out, interpret, res, g):
    from bignn_tpu.ops.pallas.segment import segment_sum_pallas

    v, src, dst, alpha, src_perm, src_sorted = res
    n, h, d = v.shape
    # g is the [num_out, H*D] kernel output cotangent (callers reshape).
    g_e = jnp.take(g, dst, axis=0, mode="clip")  # [E, H*D]
    g_e = jnp.where((dst < num_out)[:, None], g_e, 0.0)
    v2 = v.reshape(n, h * d)
    v_e = jnp.take(v2, src, axis=0, mode="clip")  # [E, H*D]
    # d_alpha[e, i] = <g_e, v_e> over head i's lane slice — static slices
    # of the flat product, so no [E, H, D] value is ever formed
    d_alpha = jnp.stack(
        [jnp.sum(g_e[:, i * d:(i + 1) * d] * v_e[:, i * d:(i + 1) * d],
                 axis=1) for i in range(h)], axis=1)  # [E, H]
    m = g_e * _alpha_wide(alpha, d, g_e.dtype)  # [E, H*D]
    if src_perm.shape[0] == 0:
        src_perm = jnp.argsort(src)
        src_sorted = jnp.take(src, src_perm)
    d_v = segment_sum_pallas(
        jnp.take(m, src_perm, axis=0), src_sorted, n, interpret=interpret
    ).reshape(n, h, d)
    return (d_v.astype(v.dtype), None, None, d_alpha.astype(alpha.dtype),
            None, None)


_spmm_mh_vjp.defvjp(_mh_fwd, _mh_bwd)
