"""On-device block-diagonal adjacency build (ops/pallas/block_adj.py):
kernel parity vs the XLA scatter reference, and end-to-end parity of the
dense-inner minibatch path vs the streaming block-SpMM path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bignn_tpu.data import make_synthetic_ddi
from bignn_tpu.models import BiGNN, BiGNNConfig
from bignn_tpu.ops.pallas.block_adj import build_block_adj, build_block_adj_xla
from bignn_tpu.train.trainer import MinibatchTrainer, TrainConfig


def _random_block_local_edges(rng, nblk, max_deg=6):
    """Edges whose endpoints share a 128-row block, dst-sorted, plus padding."""
    src_all, dst_all = [], []
    for b in range(nblk):
        n_e = rng.integers(10, 128 * max_deg)
        lo = b * 128
        src_all.append(rng.integers(lo, lo + 128, n_e))
        dst_all.append(np.sort(rng.integers(lo, lo + 128, n_e)))
    src = np.concatenate(src_all).astype(np.int32)
    dst = np.concatenate(dst_all).astype(np.int32)
    n = nblk * 128
    pad = (-len(src)) % 128 + 256  # force padding edges too
    src = np.concatenate([src, np.zeros(pad, np.int32)])
    dst = np.concatenate([dst, np.full(pad, n, np.int32)])
    bounds = np.arange(0, n + 1, 128)
    estarts = np.searchsorted(dst, bounds, side="left").astype(np.int32)
    return src, dst, estarts, n


@pytest.mark.parametrize("weighted", [False, True])
def test_build_matches_xla_reference(weighted):
    rng = np.random.default_rng(0)
    src, dst, estarts, n = _random_block_local_edges(rng, nblk=7)
    w = None
    if weighted:
        w = np.where(dst < n, rng.random(len(src)), 0.0).astype(np.float32)
        w_j = jnp.asarray(w)
    ref = np.asarray(build_block_adj_xla(
        jnp.asarray(src), jnp.asarray(dst),
        None if w is None else w_j, n))
    out = np.asarray(build_block_adj(
        jnp.asarray(src), jnp.asarray(dst),
        None if w is None else w_j,
        jnp.asarray(estarts), n, jnp.float32, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_build_int8_count_parity():
    """int8 count-adjacency parity vs the f32 build (ADVICE r4): the
    trainer stores multiplicity counts as int8 when r_node^2 <= 127; the
    kernel's f32 accumulator must cast without wrapping for in-range
    counts, including duplicate edges."""
    rng = np.random.default_rng(7)
    src, dst, estarts, n = _random_block_local_edges(rng, nblk=3)
    # inject duplicate (dst, src) pairs to exercise multiplicity > 1
    src[1] = src[0]
    dst[1] = dst[0]
    ref = np.asarray(build_block_adj(
        jnp.asarray(src), jnp.asarray(dst), None,
        jnp.asarray(estarts), n, jnp.float32, interpret=True))
    assert ref.max() >= 2  # the injected duplicate
    assert ref.max() <= 127, "test edges must stay in int8 range"
    out = np.asarray(build_block_adj(
        jnp.asarray(src), jnp.asarray(dst), None,
        jnp.asarray(estarts), n, jnp.int8, interpret=True))
    assert out.dtype == np.int8
    np.testing.assert_array_equal(out.astype(np.float32), ref)


def test_int8_guard_widens_for_large_superrows():
    """The trainer must not choose int8 counts when r_node^2 > 127 (a
    superrow pair's multiplicity is bounded by r_node^2 and the kernel's
    f32->int8 cast wraps silently)."""
    import inspect

    from bignn_tpu.train import trainer as trainer_mod

    src = inspect.getsource(trainer_mod.MinibatchTrainer._expand_compact)
    assert "R_N * R_N <= 127" in src


def test_build_int16_count_parity():
    """The widened int16 branch the guard selects for r_node^2 > 127 must
    actually build and match (not just exist as a dtype choice): exercise
    build_block_adj(out_dtype=int16) with multiplicities past the int8
    range, interpret mode."""
    rng = np.random.default_rng(11)
    src, dst, estarts, n = _random_block_local_edges(rng, nblk=2)
    # force one (dst, src) pair's multiplicity beyond int8 range
    src[1:201] = src[0]
    dst[1:201] = dst[0]
    dst[:201] = np.sort(dst[:201])  # keep the dst-sorted contract
    ref = np.asarray(build_block_adj(
        jnp.asarray(src), jnp.asarray(dst), None,
        jnp.asarray(estarts), n, jnp.float32, interpret=True))
    assert ref.max() > 127, "test must exceed the int8 range"
    assert ref.max() <= 32767
    out = np.asarray(build_block_adj(
        jnp.asarray(src), jnp.asarray(dst), None,
        jnp.asarray(estarts), n, jnp.int16, interpret=True))
    assert out.dtype == np.int16
    np.testing.assert_array_equal(out.astype(np.float32), ref)


@pytest.mark.parametrize("inner", [("gin:16", "gin:16"), ("gcn:16", "gin:16")])
def test_dense_inner_matches_streaming(inner):
    ds = make_synthetic_ddi(num_drugs=40, feat_dim=8, avg_degree=6.0,
                            min_atoms=4, max_atoms=10, seed=0)
    model = BiGNN(BiGNNConfig(feat_dim=8, inner_layers=inner,
                              outer_layers=("gcn:16:identity",)))
    cfg = TrainConfig(batch_size=8, epochs=1)
    tr_dense = MinibatchTrainer(model, ds, cfg, fanouts=(4,), calibrate_caps=2)
    tr_stream = MinibatchTrainer(model, ds, cfg, fanouts=(4,), calibrate_caps=2)
    tr_stream.dense_inner = False  # before the first trace

    assert tr_dense.dense_inner and tr_dense.sampler.block_local
    params, _ = tr_dense.init()
    tr_dense.sampler.reseed(0)
    cb = jax.tree.map(jnp.asarray, tr_dense.sampler.sample_compact())

    out_d = np.asarray(tr_dense._score_batch(params, cb, tr_dense.tables))
    out_s = np.asarray(tr_stream._score_batch(params, cb, tr_stream.tables))
    np.testing.assert_allclose(out_d, out_s, rtol=2e-4, atol=2e-5)

    # grads agree too (the dense backward is AD through the batched matmul)
    def loss(t, p):
        return jnp.sum(t._forward(p, cb, t.tables) ** 2)

    g_d = jax.grad(lambda p: loss(tr_dense, p))(params)
    g_s = jax.grad(lambda p: loss(tr_stream, p))(params)
    for a, b in zip(jax.tree.leaves(g_d), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)
