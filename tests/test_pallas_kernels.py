"""Pallas kernel parity in interpret mode (SURVEY.md §4 item 1) and the
pallas backend end-to-end through the model (CPU CI; real-TPU runs happen in
the bench harness)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bignn_tpu.ops as ops
from bignn_tpu.ops.pallas.segment import segment_sum_pallas, segment_softmax_pallas
from bignn_tpu.oracle.numpy_ref import segment_softmax_ref


def _sorted_ids(rng, e, n, pad_frac=0.1):
    seg = np.sort(rng.integers(0, n, e)).astype(np.int32)
    npad = max(int(e * pad_frac), 1)
    seg[-npad:] = n  # padding tail -> dropped
    return np.sort(seg)


@pytest.mark.parametrize(
    "e,n,f",
    [(1000, 50, 16), (5000, 300, 64), (100, 5, 1), (8, 3, 4),
     (1024, 130, 128), (3000, 128, 128), (257, 9, 130)],
)
def test_segment_sum_pallas_interpret(e, n, f):
    rng = np.random.default_rng(e + n + f)
    seg = _sorted_ids(rng, e, n)
    data = rng.normal(size=(e, f)).astype(np.float32)
    out = np.asarray(
        segment_sum_pallas(jnp.asarray(data), jnp.asarray(seg), n, interpret=True)
    )
    expect = np.zeros((n, f), np.float32)
    for i, s in enumerate(seg):
        if s < n:
            expect[s] += data[i]
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_segment_sum_pallas_block_boundary_rows():
    # segments exactly at multiples of block_rows (128) exercise the
    # ownership boundaries between grid steps
    e, n = 4096, 300
    rng = np.random.default_rng(0)
    seg = np.sort(np.concatenate([
        np.full(50, 127), np.full(50, 128), np.full(50, 255), np.full(50, 256),
        rng.integers(0, n, e - 200),
    ])).astype(np.int32)
    data = rng.normal(size=(e, 32)).astype(np.float32)
    out = np.asarray(
        segment_sum_pallas(jnp.asarray(data), jnp.asarray(seg), n, interpret=True)
    )
    expect = np.zeros((n, 32), np.float32)
    for i, s in enumerate(seg):
        expect[s] += data[i]
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape", [(), (4,)])
def test_segment_softmax_pallas_interpret(shape):
    rng = np.random.default_rng(7)
    e, n = 600, 40
    seg = _sorted_ids(rng, e, n)
    scores = rng.normal(size=(e,) + shape).astype(np.float32)
    out = np.asarray(
        segment_softmax_pallas(jnp.asarray(scores), jnp.asarray(seg), n, interpret=True)
    )
    expect = segment_softmax_ref(np.asarray(scores, np.float64), seg, n)
    real = seg < n
    np.testing.assert_allclose(out[real], expect[real], rtol=1e-4, atol=1e-5)


def test_ops_dispatch_pallas_interpret_matches_xla():
    rng = np.random.default_rng(1)
    n, e, f = 64, 512, 32
    dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
    src = rng.integers(0, n, e).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    args = (jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), n)
    ref = np.asarray(ops.spmm_sorted_coo(*args, backend="xla"))
    with ops.backend_scope("pallas_interpret"):
        out = np.asarray(ops.spmm_sorted_coo(*args))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_full_model_pallas_interpret_matches_xla():
    from bignn_tpu.data import make_synthetic_ddi, prepare_device_data
    from bignn_tpu.models import BiGNN, BiGNNConfig

    ds = make_synthetic_ddi(num_drugs=30, feat_dim=8, avg_degree=5.0,
                            min_atoms=4, max_atoms=8, seed=0)
    data = prepare_device_data(ds, max_buckets=2)
    model = BiGNN(BiGNNConfig.full_bignn(feat_dim=8, dim=16, heads=2))
    params = model.init(jax.random.key(0))
    buckets = tuple(jax.tree.map(jnp.asarray, b) for b in data.bucketing.batches)
    gidx = tuple(jnp.asarray(i) for i in data.bucketing.graph_index)
    outer = jax.tree.map(jnp.asarray, data.outer)
    pairs = jnp.asarray(
        np.random.default_rng(0).integers(0, 30, (12, 2)), jnp.int32
    )
    ref = np.asarray(model.apply(params, buckets, gidx, outer, pairs))
    with ops.backend_scope("pallas_interpret"):
        out = np.asarray(model.apply(params, buckets, gidx, outer, pairs))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("shape", [(), (4,), (3,)])
def test_segment_max_pallas_interpret(shape):
    from bignn_tpu.ops.pallas.segment import segment_max_pallas

    rng = np.random.default_rng(11)
    e, n = 700, 45
    seg = _sorted_ids(rng, e, n)
    scores = rng.normal(size=(e,) + shape).astype(np.float32)
    out = np.asarray(
        segment_max_pallas(jnp.asarray(scores), jnp.asarray(seg), n, interpret=True)
    )
    ref = np.asarray(jax.ops.segment_max(
        jnp.asarray(scores), jnp.asarray(seg), num_segments=n,
        indices_are_sorted=True,
    ))
    ref = np.where(np.isfinite(ref), ref, 0.0)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_segment_max_vjp_grad_parity():
    from bignn_tpu.ops.pallas.segment import segment_max_pallas_vjp

    rng = np.random.default_rng(12)
    e, n = 300, 20
    seg = np.sort(rng.integers(0, n, e)).astype(np.int32)
    d = jnp.asarray(rng.normal(size=(e, 5)).astype(np.float32))

    def f_p(x):
        return jnp.sum(jnp.sin(segment_max_pallas_vjp(
            x, jnp.asarray(seg), n, interpret=True)))

    def f_x(x):
        m = jax.ops.segment_max(x, jnp.asarray(seg), num_segments=n,
                                indices_are_sorted=True)
        return jnp.sum(jnp.sin(jnp.where(jnp.isfinite(m), m, 0.0)))

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_p)(d)), np.asarray(jax.grad(f_x)(d)), atol=1e-5
    )


def test_gat_training_step_pallas_interpret():
    """GAT conv (softmax + multihead + max) differentiates end-to-end on the
    pallas backend."""
    from bignn_tpu.models import GATConv

    rng = np.random.default_rng(13)
    n, e, f = 32, 256, 16
    dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
    src = rng.integers(0, n, e).astype(np.int32)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    conv = GATConv(f, 16, heads=4)
    params = conv.init(jax.random.key(0))

    def loss(p, x):
        with ops.backend_scope("pallas_interpret"):
            out = conv.apply(p, x, jnp.asarray(src), jnp.asarray(dst), None, n)
        return jnp.sum(out**2)

    def loss_x(p, x):
        out = conv.apply(p, x, jnp.asarray(src), jnp.asarray(dst), None, n)
        return jnp.sum(out**2)

    g_p = jax.grad(loss)(params, x)
    g_x = jax.grad(loss_x)(params, x)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)

def test_spmm_precomputed_src_perm_grad_matches_argsort():
    """The host-precomputed src_perm/src_sorted backward (no device sort)
    must match both the argsort fallback and the XLA backend, for values and
    gradients, including padded edges (dst == n)."""
    from bignn_tpu.sparse.formats import src_sort_arrays

    rng = np.random.default_rng(3)
    n, e_real, e_cap, f = 48, 400, 512, 16
    dst = np.sort(rng.integers(0, n, e_real)).astype(np.int32)
    dst = np.concatenate([dst, np.full(e_cap - e_real, n, np.int32)])
    src = np.concatenate([
        rng.integers(0, n, e_real), np.zeros(e_cap - e_real, np.int64)
    ]).astype(np.int32)
    w = np.concatenate([
        rng.random(e_real), np.zeros(e_cap - e_real)
    ]).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    perm, ssorted = src_sort_arrays(src)
    a = [jnp.asarray(v) for v in (x, src, dst, w)]
    kp = dict(src_perm=jnp.asarray(perm), src_sorted=jnp.asarray(ssorted))

    def loss(x, **kw):
        with ops.backend_scope("pallas_interpret"):
            out = ops.spmm_sorted_coo(x, a[1], a[2], a[3], n, **kw)
        return jnp.sum(out ** 2)

    def loss_xla(x):
        return jnp.sum(ops.spmm_sorted_coo(x, a[1], a[2], a[3], n, backend="xla") ** 2)

    v_perm, g_perm = jax.value_and_grad(lambda x: loss(x, **kp))(a[0])
    v_sort, g_sort = jax.value_and_grad(loss)(a[0])
    v_xla, g_xla = jax.value_and_grad(loss_xla)(a[0])
    np.testing.assert_allclose(np.asarray(v_perm), np.asarray(v_sort), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_perm), np.asarray(g_sort), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_perm), np.asarray(g_xla), rtol=1e-4, atol=1e-5)


def test_multihead_precomputed_src_perm_grads():
    from bignn_tpu.ops.multihead import spmm_multihead
    from bignn_tpu.sparse.formats import src_sort_arrays

    rng = np.random.default_rng(4)
    n, e, h, d = 32, 256, 2, 8
    dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
    src = rng.integers(0, n, e).astype(np.int32)
    alpha = rng.random((e, h)).astype(np.float32)
    v = rng.normal(size=(n, h, d)).astype(np.float32)
    perm, ssorted = src_sort_arrays(src)

    def loss(v, alpha, use_perm):
        kw = (dict(src_perm=jnp.asarray(perm), src_sorted=jnp.asarray(ssorted))
              if use_perm else {})
        with ops.backend_scope("pallas_interpret"):
            out = spmm_multihead(v, jnp.asarray(src), jnp.asarray(dst),
                                 alpha, n, **kw)
        return jnp.sum(out ** 2)

    gv_p, ga_p = jax.grad(lambda v, a: loss(v, a, True), argnums=(0, 1))(
        jnp.asarray(v), jnp.asarray(alpha))
    gv_s, ga_s = jax.grad(lambda v, a: loss(v, a, False), argnums=(0, 1))(
        jnp.asarray(v), jnp.asarray(alpha))
    np.testing.assert_allclose(np.asarray(gv_p), np.asarray(gv_s), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_s), rtol=1e-4, atol=1e-5)


def test_expanded_compact_src_perm_is_valid():
    """The device-expanded src permutation must sort the expanded edge_src
    and point at the right edges (resident minibatch path)."""
    from bignn_tpu.data import HierarchicalSampler, make_synthetic_ddi
    from bignn_tpu.models import BiGNN, BiGNNConfig
    from bignn_tpu.train import MinibatchTrainer, TrainConfig

    ds = make_synthetic_ddi(num_drugs=60, feat_dim=8, avg_degree=5.0,
                            min_atoms=4, max_atoms=9, seed=2)
    model = BiGNN(BiGNNConfig.config1(feat_dim=8))
    tr = MinibatchTrainer(model, ds, TrainConfig(batch_size=16),
                          fanouts=(4,), resident=True)
    tr.dense_inner = False  # the dense-adjacency path skips the src perm;
    # this test checks the sparse (streaming-kernel) layout machinery
    cb = jax.tree.map(jnp.asarray, tr.sampler.sample_compact())
    pb = jax.jit(tr._expand_compact)(cb, tr.tables)
    src = np.asarray(pb.edge_src)
    perm = np.asarray(pb.edge_src_perm)
    ssorted = np.asarray(pb.edge_src_sorted)
    dst = np.asarray(pb.edge_dst)
    # bijective over the full cap (quantized layouts intersperse masked
    # padding between molecules; padding positions map to themselves)
    assert sorted(perm) == list(range(pb.edge_cap))
    valid = ssorted < pb.node_cap
    # valid entries of the src-sorted stream ascend globally (per-molecule
    # src-sorted blocks at increasing offsets)...
    vs = ssorted[valid]
    assert np.all(np.diff(vs) >= 0)
    # ...and point at the right edges
    np.testing.assert_array_equal(vs, src[perm[valid]])
    # every real edge is covered by the valid src-sorted entries
    assert int(valid.sum()) == int((dst < pb.node_cap).sum())

def test_block_spmm_kernel_fwd_bwd_interpret():
    """Fused block-local SpMM (ops/pallas/block_spmm.py) vs dense reference,
    weighted + unweighted + grad, on synthetic block-local edges."""
    from bignn_tpu.ops.pallas.block_spmm import (
        BLOCK_ROWS, block_estarts, block_spmm, _block_spmm_impl)

    rng = np.random.default_rng(0)
    G, F = 3, 32
    N = G * BLOCK_ROWS
    srcs, dsts = [], []
    for b in range(G):
        e = int(rng.integers(80, 200))
        srcs.append(rng.integers(0, BLOCK_ROWS, e) + b * BLOCK_ROWS)
        dsts.append(rng.integers(0, BLOCK_ROWS, e) + b * BLOCK_ROWS)
    src = np.concatenate(srcs).astype(np.int32)
    dst = np.concatenate(dsts).astype(np.int32)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    w = rng.random(len(src)).astype(np.float32)
    x = rng.normal(size=(N, F)).astype(np.float32)
    est = block_estarts(jnp.asarray(dst), N)

    ref = np.zeros((N, F), np.float32)
    np.add.at(ref, dst, x[src] * w[:, None])
    out = np.asarray(_block_spmm_impl(
        jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w),
        est, N, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    perm = np.argsort(src, kind="stable")
    tsrc = dst[perm].astype(np.int32)
    tdst = src[perm].astype(np.int32)
    tw = w[perm]
    tst = block_estarts(jnp.asarray(tdst), N)

    def loss(x, w):
        return jnp.sum(block_spmm(
            x, jnp.asarray(src), jnp.asarray(dst), w, est,
            jnp.asarray(tsrc), jnp.asarray(tdst), jnp.asarray(tw), tst, N,
            interpret=True) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    gout = 2 * ref
    dxref = np.zeros((N, F), np.float32)
    np.add.at(dxref, src, gout[dst] * w[:, None])
    dwref = np.sum(gout[dst] * x[src], axis=-1)
    np.testing.assert_allclose(np.asarray(gx), dxref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), dwref, rtol=1e-4, atol=1e-4)


def test_resident_block_local_path_matches_host_interpret():
    """End-to-end: resident expansion with block packing + fused block
    kernel (pallas_interpret) == host-gathered path on the XLA backend."""
    from bignn_tpu.data import HierarchicalSampler, make_synthetic_ddi
    from bignn_tpu.models import BiGNN, BiGNNConfig
    from bignn_tpu.train import MinibatchTrainer, TrainConfig

    ds = make_synthetic_ddi(num_drugs=80, feat_dim=8, avg_degree=5.0,
                            min_atoms=4, max_atoms=10, seed=5)
    model = BiGNN(BiGNNConfig(feat_dim=8, inner_layers=("gin:16", "gcn:16"),
                              outer_layers=("gcn:16:identity",)))
    tr = MinibatchTrainer(model, ds, TrainConfig(batch_size=12), fanouts=(4,),
                          resident=True)
    assert tr.sampler.block_local
    params, _ = tr.init()
    rng = np.random.default_rng(1)
    pairs = ds.split_edges("train")[rng.choice(60, 12, replace=False)].astype(np.int64)
    labels = np.ones(len(pairs), np.float32)
    tr.sampler._rng = np.random.default_rng(9)
    hb = tr.sampler.batch_from_pairs(pairs, labels)
    tr.sampler._rng = np.random.default_rng(9)
    cb = tr.sampler.compact_from_pairs(pairs, labels)
    ref = np.asarray(tr._forward(params, jax.tree.map(jnp.asarray, hb)))

    with ops.backend_scope("pallas_interpret"):
        got = np.asarray(
            tr._forward(params, jax.tree.map(jnp.asarray, cb), tr.tables))
        # gradients through the block kernel too
        def loss(p):
            return jnp.sum(tr._forward(
                p, jax.tree.map(jnp.asarray, cb), tr.tables) ** 2)
        g_blk = jax.grad(loss)(params)

    def loss_ref(p):
        return jnp.sum(tr._forward(p, jax.tree.map(jnp.asarray, hb)) ** 2)
    g_ref = jax.grad(loss_ref)(params)
    np.testing.assert_allclose(got[: len(pairs)], ref[: len(pairs)],
                               rtol=1e-4, atol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4),
        g_blk, g_ref)
