"""Parity of the flash-tiled masked GAT attention kernel
(ops/pallas/flash_gat.py, interpret mode) vs the XLA dense reference
(models/convs._dense_masked_softmax_agg) — values and gradients, including
empty rows, edge multiplicity > 1, and N not a multiple of the 128 tile.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bignn_tpu.models.convs import GATConv, _dense_masked_softmax_agg
from bignn_tpu.ops.pallas.flash_gat import flash_gat_attention

N, H, D = 200, 4, 16
SLOPE = 0.2


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    score_l = jnp.asarray(rng.standard_normal((N, H)), jnp.float32)
    score_r = jnp.asarray(rng.standard_normal((N, H)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((N, H, D)), jnp.float32)
    cnt = (rng.random((N, N)) < 0.05).astype(np.float32)
    cnt += (rng.random((N, N)) < 0.01)  # some multiplicity-2 edges
    cnt[17] = 0.0  # a row with no incoming edges
    cnt[140:] = 0.0  # a tail of empty rows (mimics padding)
    return score_l, score_r, v, jnp.asarray(cnt)


def _reference(score_l, score_r, v, cnt):
    e = jax.nn.leaky_relu(score_l[:, None, :] + score_r[None, :, :], SLOPE)
    return _dense_masked_softmax_agg(e, cnt, v, jnp.float32)


def test_forward_parity(inputs):
    score_l, score_r, v, cnt = inputs
    got = flash_gat_attention(score_l, score_r, v, cnt, SLOPE, True)
    want = _reference(score_l, score_r, v, cnt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(got)[17] == 0.0)


def test_pallas_forward_kernel_parity(inputs):
    """The standalone Pallas forward (kept for ablation/benchmarks) and the
    fused XLA forward agree on values and logsumexp residuals."""
    from bignn_tpu.ops.pallas.flash_gat import NEG, _flash_fwd, _fused_fwd_xla

    score_l, score_r, v, cnt = inputs
    got, lse_got = _flash_fwd(score_l, score_r, v, cnt,
                              slope=SLOPE, interpret=True)
    want, lse_want = _fused_fwd_xla(score_l, score_r, v, cnt, slope=SLOPE)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lse_got), np.asarray(lse_want),
                               rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(lse_got)[17] == NEG)


def test_gradient_parity(inputs):
    score_l, score_r, v, cnt = inputs
    w = jnp.asarray(
        np.random.default_rng(1).standard_normal((N, H, D)), jnp.float32)

    def loss_flash(sl, sr, vv):
        return jnp.sum(flash_gat_attention(sl, sr, vv, cnt, SLOPE, True) * w)

    def loss_ref(sl, sr, vv):
        return jnp.sum(_reference(sl, sr, vv, cnt) * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(score_l, score_r, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(score_l, score_r, v)
    for gf, gr, name in zip(g_flash, g_ref, ("d_score_l", "d_score_r", "d_v")):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_gatconv_dense_backend_parity():
    """GATConv over a dense outer graph: pallas_interpret == xla."""
    import bignn_tpu.ops as ops
    from bignn_tpu.sparse.formats import build_outer_graph

    rng = np.random.default_rng(2)
    n = 150
    src = rng.integers(0, n, 600)
    dst = rng.integers(0, n, 600)
    outer = build_outer_graph(src, dst, n)
    assert outer.dense_adj is not None
    conv = GATConv(in_dim=24, out_dim=32, heads=4)
    params = conv.init(jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((n, 24)), jnp.float32)
    dense = (jnp.asarray(outer.dense_adj), jnp.asarray(outer.dense_cnt))

    def run():
        return conv.apply(params, x, jnp.asarray(outer.edge_src),
                          jnp.asarray(outer.edge_dst),
                          jnp.asarray(outer.edge_weight), n, dense=dense)

    with ops.backend_scope("xla"):
        want = run()
    with ops.backend_scope("pallas_interpret"):
        got = run()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
