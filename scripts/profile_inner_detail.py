"""Fine-grained inner-level timing for the drugbank preset (bf16, Pallas)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

K = 32


def timed(make_body, *args, n=5, name=""):
    def run(*a):
        def step(c, i):
            out = make_body(i, *a)
            s = jax.tree.reduce(
                lambda x, y: x + y,
                jax.tree.map(lambda l: jnp.ravel(l)[0].astype(jnp.float32), out))
            return c + s, None
        tot, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(K))
        return tot
    jfn = jax.jit(run)
    np.asarray(jfn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); np.asarray(jfn(*args)); ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {float(np.median(ts))/K*1e3:9.3f} ms/iter", flush=True)


def main():
    from bignn_tpu.data import load_dataset, prepare_device_data
    from bignn_tpu.models import BiGNN, BiGNNConfig

    ds = load_dataset("drugbank")
    data = prepare_device_data(ds, max_buckets=4)
    model = BiGNN(dataclasses.replace(
        BiGNNConfig.full_bignn(feat_dim=ds.feat_dim, dim=64, heads=4),
        dtype="bfloat16"))
    params = model.init(jax.random.key(0))

    buckets = tuple(jax.tree.map(jnp.asarray, b) for b in data.bucketing.batches)
    gidx = tuple(jnp.asarray(i) for i in data.bucketing.graph_index)

    inner, inner_dim = model._inner_stack()
    cp = model.cast(params)

    # per-bucket full inner encode
    for bi, b in enumerate(buckets):
        timed(lambda i, p, b=b: (model.encode_inner(
            p, dataclasses.replace(b, node_feat=b.node_feat + i)).sum(),),
            params, name=f"encode_inner bucket{bi} (n={b.node_cap})")

    # single conv on the largest bucket
    b = buckets[-1]
    x0 = b.node_feat.astype(model.compute_dtype)
    block_plan = None
    if b.block_estarts is not None:
        block_plan = (b.block_estarts, b.edge_tsrc, b.edge_tdst,
                      b.edge_tweight, b.block_tstarts)

    def conv_only(i, p, x):
        y = inner[0].apply(
            p["inner"]["layer_0"], x + i.astype(x.dtype), b.edge_src, b.edge_dst,
            b.edge_weight, b.node_cap, src_perm=b.edge_src_perm,
            src_sorted=b.edge_src_sorted, block_plan=block_plan)
        return (y.sum(),)
    timed(conv_only, cp, x0, name="one GIN conv (largest bucket)")

    # aggregation only (the block SpMM) on the largest bucket
    import bignn_tpu.ops as ops
    def agg_only(i, x):
        y = ops.spmm_sorted_coo(
            x + i.astype(x.dtype), b.edge_src, b.edge_dst, b.edge_weight,
            b.node_cap, src_perm=b.edge_src_perm, src_sorted=b.edge_src_sorted,
            block_plan=block_plan)
        return (y.sum(),)
    try:
        timed(agg_only, x0, name="agg only (largest bucket)")
    except Exception as e:
        print("agg_only failed:", type(e).__name__, str(e)[:200])

    # readout only
    ro = model._readout_obj()
    def ro_only(i, x):
        y = ro.apply(cp["readout"], x + i.astype(x.dtype), b.graph_ids,
                     b.num_graphs, b.graph_n_nodes)
        return (y.sum(),)
    timed(ro_only, x0, name="readout only (largest bucket)")

    # scatter of bucket embeddings into the drug matrix
    embs = [jnp.zeros((bb.num_graphs, inner_dim), jnp.float32) for bb in buckets]
    def scat(i, embs):
        out = jnp.zeros((ds.num_drugs, inner_dim), jnp.float32)
        for e, idx in zip(embs, gidx):
            out = out.at[idx].set(e + i)
        return (out.sum(),)
    timed(scat, embs, name="bucket->drug scatter (4 buckets)")


if __name__ == "__main__":
    main()
