"""Flash-style masked GAT attention over a dense multiplicity mask.

The dense outer-graph path (models/convs.py ``_dense_masked_softmax_agg``)
is exact and MXU-friendly, but XLA materializes every [N, N, H] intermediate
(scores, exp, alpha, and their cotangents) in HBM — at DrugBank scale
(N=1704, H=4) the backward alone moves ~5 x 23 MB and dominates the train
step (~0.6 ms of a ~0.96 ms step).

This kernel computes the identical masked softmax aggregation

    z[d, s, h]   = leaky_relu(score_l[d, h] + score_r[s, h])
    alpha[d,s,h] = cnt[d, s] * exp(z - max) / sum_s(...)   (cnt = edge
                   multiplicity; 0 = no edge; rows with no edges -> 0)
    out[d, h, :] = sum_s alpha[d, s, h] * v[s, h, :]

with only O(N*H*D) HBM traffic beyond a single pass over cnt per kernel:
no [N, N, H] tensor ever exists. The target graphs are small (N <=
dense_max_nodes = 4096), so the whole src range fits in VMEM per program —
each forward program owns a [BLK, Np] row-block of cnt and performs a
single-pass (not online) softmax over its full rows; each backward program
owns a [Np, BLK] column-block and produces its d_score_r / d_v block
outright, accumulating only d_score_l in a VMEM-resident output.

Layout notes (TPU lanes are the last dim):
  * score_r enters transposed as [H, Np] so the per-head src row is a
    lane vector and broadcasts across sublanes for free; the [N, H]
    layout would need an in-kernel column->row transpose per tile.
  * row blocks are sized so a cnt tile is ~2 MB (256 rows at Np<=2048,
    128 at the 4096 cap), keeping the grid at 7-32 programs instead of
    the O((N/128)^2) a tiled online-softmax would need.

Backward recomputes z / alpha from the saved logsumexp instead of saving
alpha (standard flash VJP):

    d_e[d,s,h]     = alpha * (g . v[s,h] - delta[d,h]),  delta = sum_f g*out
    d_z            = d_e * (1 if z > 0 else slope)
    d_score_l[d,h] = sum_s d_z      (VMEM-resident accumulator)
    d_score_r[s,h] = sum_d d_z      (one block per src program)
    d_v[s,h,:]     = sum_d alpha * g[d,h,:]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bignn_tpu.ops.pallas.util import out_struct

NEG = -1e30  # "minus infinity" that survives f32 arithmetic


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


def _pick_blk(np_: int) -> int:
    # keep one [BLK, Np] f32 cnt tile around 2 MB
    return 256 if np_ <= 2048 else 128


def _fwd_kernel(sl_ref, srt_ref, v_ref, cnt_ref, out_ref, lse_ref,
                *, heads, head_dim, slope):
    cnt = cnt_ref[:].astype(jnp.float32)  # [BLK(dst), Np(src)]
    valid = cnt > 0.0
    for h in range(heads):
        z = (sl_ref[:, h:h + 1] + srt_ref[h:h + 1, :]).astype(jnp.float32)
        e = jnp.where(z > 0, z, slope * z)
        e = jnp.where(valid, e, NEG)
        m = jnp.max(e, axis=1, keepdims=True)  # [BLK, 1]
        p = cnt * jnp.exp(e - m)  # rows with no edges: exp(0) * 0 = 0
        l = jnp.sum(p, axis=1, keepdims=True)  # [BLK, 1]
        vh = v_ref[:, h * head_dim:(h + 1) * head_dim]
        pv = jax.lax.dot(
            p.astype(vh.dtype), vh, preferred_element_type=jnp.float32)
        safe = jnp.maximum(l, 1e-30)
        out_ref[:, h * head_dim:(h + 1) * head_dim] = (
            pv / safe).astype(out_ref.dtype)
        lse_ref[:, h:h + 1] = jnp.where(l > 0, m + jnp.log(safe), NEG)


def _bwd_kernel(sl_ref, srt_ref, v_ref, cnt_ref, g_ref, lse_ref, delta_ref,
                dsl_ref, dsrt_ref, dv_ref, *, heads, head_dim, slope):
    j = pl.program_id(0)  # src block

    @pl.when(j == 0)
    def _():
        dsl_ref[:] = jnp.zeros_like(dsl_ref)

    cnt = cnt_ref[:].astype(jnp.float32)  # [Np(dst), BLK(src)]
    for h in range(heads):
        z = (sl_ref[:, h:h + 1] + srt_ref[h:h + 1, :]).astype(jnp.float32)
        e = jnp.where(z > 0, z, slope * z)
        # alpha = cnt * exp(e - lse); empty rows have lse == NEG and cnt == 0,
        # and e - NEG overflows, so mask e to NEG there (exp(0) * 0 = 0)
        e = jnp.where(cnt > 0, e, NEG)
        alpha = cnt * jnp.exp(jnp.minimum(e - lse_ref[:, h:h + 1], 0.0))
        gh = g_ref[:, h * head_dim:(h + 1) * head_dim]
        vh = v_ref[:, h * head_dim:(h + 1) * head_dim]
        # d_alpha[d, s] = g[d] . v[s]
        d_alpha = jax.lax.dot_general(
            gh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_e = alpha * (d_alpha - delta_ref[:, h:h + 1])
        d_z = jnp.where(z > 0, d_e, slope * d_e)
        dsl_ref[:, h:h + 1] += jnp.sum(d_z, axis=1, keepdims=True)
        dsrt_ref[h:h + 1, :] = jnp.sum(d_z, axis=0, keepdims=True)
        # d_v[s] = alpha^T @ g  (this src block sees every dst row at once)
        dv_ref[:, h * head_dim:(h + 1) * head_dim] = jax.lax.dot_general(
            alpha.astype(gh.dtype), gh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("slope", "interpret"))
def _flash_fwd(score_l, score_r, v, cnt, *, slope, interpret):
    n, heads = score_l.shape
    head_dim = v.shape[-1]
    blk = _pick_blk(_round_up(n, 128))
    np_ = _round_up(n, blk)
    vd = v.reshape(n, heads * head_dim)
    srt = score_r.T  # [H, n]
    if np_ != n:
        pad = np_ - n
        score_l = jnp.pad(score_l, ((0, pad), (0, 0)))
        srt = jnp.pad(srt, ((0, 0), (0, pad)))
        vd = jnp.pad(vd, ((0, pad), (0, 0)))
        cnt = jnp.pad(cnt, ((0, pad), (0, pad)))
    nb = np_ // blk
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, head_dim=head_dim,
                          slope=slope),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((blk, heads), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # score_l by dst
            pl.BlockSpec(memory_space=pltpu.VMEM),  # score_r^T (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v (full)
            pl.BlockSpec((blk, np_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # cnt row block
        ],
        out_specs=[
            pl.BlockSpec((blk, heads * head_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, heads), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            out_struct((np_, heads * head_dim), v.dtype, score_l, srt, vd, cnt),
            out_struct((np_, heads), jnp.float32, score_l, srt, vd, cnt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(score_l, srt, vd, cnt)
    return out[:n].reshape(n, heads, head_dim), lse[:n]


@functools.partial(jax.jit, static_argnames=("slope", "interpret"))
def _flash_bwd(score_l, score_r, v, cnt, lse, out, g, *, slope, interpret):
    n, heads = score_l.shape
    head_dim = v.shape[-1]
    blk = _pick_blk(_round_up(n, 128))
    np_ = _round_up(n, blk)
    gd = g.reshape(n, heads * head_dim).astype(v.dtype)
    vd = v.reshape(n, heads * head_dim)
    srt = score_r.T
    delta = jnp.sum(g.astype(jnp.float32)
                    * out.astype(jnp.float32), axis=-1)  # [n, H]
    if np_ != n:
        pad = np_ - n
        score_l = jnp.pad(score_l, ((0, pad), (0, 0)))
        srt = jnp.pad(srt, ((0, 0), (0, pad)))
        vd = jnp.pad(vd, ((0, pad), (0, 0)))
        gd = jnp.pad(gd, ((0, pad), (0, 0)))
        cnt = jnp.pad(cnt, ((0, pad), (0, pad)))
        lse = jnp.pad(lse, ((0, pad), (0, 0)), constant_values=NEG)
        delta = jnp.pad(delta, ((0, pad), (0, 0)))
    nb = np_ // blk
    dsl, dsrt, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, head_dim=head_dim,
                          slope=slope),
        grid=(nb,),  # src blocks; each sees the full dst range
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # score_l (full)
            pl.BlockSpec((heads, blk), lambda j: (0, j),
                         memory_space=pltpu.VMEM),  # score_r^T by src
            pl.BlockSpec((blk, heads * head_dim), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),  # v by src
            pl.BlockSpec((np_, blk), lambda j: (0, j),
                         memory_space=pltpu.VMEM),  # cnt column block
            pl.BlockSpec(memory_space=pltpu.VMEM),  # g (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lse (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # delta (full)
        ],
        out_specs=[
            pl.BlockSpec((np_, heads), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),  # d_score_l (resident)
            pl.BlockSpec((heads, blk), lambda j: (0, j),
                         memory_space=pltpu.VMEM),  # d_score_r^T by src
            pl.BlockSpec((blk, heads * head_dim), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),  # d_v by src
        ],
        out_shape=[
            out_struct((np_, heads), jnp.float32, score_l, srt, vd, cnt, gd, lse, delta),
            out_struct((heads, np_), jnp.float32, score_l, srt, vd, cnt, gd, lse, delta),
            out_struct((np_, heads * head_dim), v.dtype, score_l, srt, vd, cnt, gd, lse, delta),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(score_l, srt, vd, cnt, gd, lse, delta)
    return (dsl[:n], dsrt[:, :n].T,
            dv[:n].reshape(n, heads, head_dim))


@functools.partial(jax.jit, static_argnames=("slope",))
def _fused_fwd_xla(score_l, score_r, v, cnt, *, slope):
    """Forward as one XLA fusion, also emitting the logsumexp residual.

    Used for the PRIMAL (no-grad) path only: XLA streams the out-only masked
    softmax over cnt without materializing any [N, N, H] tensor and beats the
    Pallas forward (~32 vs ~47 us at DrugBank scale) — but only when lse is
    dead and DCE'd. Consuming lse breaks the fusion (measured 108 us vs the
    Pallas forward's 48 us), so the VJP forward uses the Pallas kernel.
    Numerics match models/convs._dense_masked_softmax_agg exactly.
    """
    e = jax.nn.leaky_relu(
        score_l[:, None, :] + score_r[None, :, :], slope)  # [N, S, H] f32
    valid = (cnt > 0)[:, :, None]
    m = jnp.max(jnp.where(valid, e, -jnp.inf), axis=1)  # [N, H]
    m = jnp.maximum(m, jnp.float32(NEG))  # rows with no edges
    z = jnp.where(valid, e - m[:, None, :], -1.0)
    p = cnt[:, :, None] * jnp.exp(z)  # cnt==0 exactly where invalid
    l = p.sum(axis=1)  # [N, H]
    safe = jnp.maximum(l, jnp.float32(1e-30))
    alpha = (p / safe[:, None, :]).astype(v.dtype)
    out = jnp.einsum(
        "dsh,shf->dhf", alpha, v,
        preferred_element_type=jnp.float32).astype(v.dtype)
    lse = jnp.where(l > 0, m + jnp.log(safe), NEG)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_gat_attention(score_l, score_r, v, cnt, slope=0.2, interpret=False):
    """Masked additive-attention aggregation, flash-tiled backward.

    score_l/score_r: [N, H] f32 pre-activation attention halves (dst/src);
    v: [N, H, D] values; cnt: [N, N] edge multiplicity (cnt[d, s]).
    Returns [N, H, D]. Exactly equals _dense_masked_softmax_agg with
    e = leaky_relu(score_l[:, None] + score_r[None, :]). Forward runs as an
    XLA fusion (see _fused_fwd_xla); the flash VJP replaces XLA's
    cotangent-materializing backward.
    """
    out, _ = _fused_fwd_xla(score_l, score_r, v, cnt, slope=slope)
    return out


def _flash_vjp_fwd(score_l, score_r, v, cnt, slope, interpret):
    out, lse = _flash_fwd(score_l, score_r, v, cnt, slope=slope,
                          interpret=interpret)
    return out, (score_l, score_r, v, cnt, lse, out)


def _flash_vjp_bwd(slope, interpret, res, g):
    score_l, score_r, v, cnt, lse, out = res
    dsl, dsr, dv = _flash_bwd(score_l, score_r, v, cnt, lse, out, g,
                              slope=slope, interpret=interpret)
    return (dsl.astype(score_l.dtype), dsr.astype(score_r.dtype),
            dv.astype(v.dtype), jnp.zeros_like(cnt))


flash_gat_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)
