"""Stage timings of the drugbank-preset bench step (bench.py headline).

Chained-K method (see profile_inner_ops.py): each stage runs K times inside
one jit, chained through a scalar perturbation so XLA cannot CSE, timed with
forced D2H, and differenced against K=1 to cancel the axon tunnel's fixed
dispatch+sync cost.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5):
    out = fn(*args)
    np.asarray(jnp.ravel(out)[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jnp.ravel(out)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench(make_chain, name, *args, K=8):
    t1 = timeit(jax.jit(make_chain(1)), *args)
    tk = timeit(jax.jit(make_chain(K)), *args)
    per = (tk - t1) / (K - 1) * 1000
    print(f"{name:22s} {per:8.3f} ms  (1x={t1*1e3:.1f} {K}x={tk*1e3:.1f})",
          flush=True)
    return per


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--batch", type=int, default=2048)
    args = p.parse_args()

    import dataclasses
    from bignn_tpu.data import load_dataset, prepare_device_data
    from bignn_tpu.models import BiGNN, BiGNNConfig
    from bignn_tpu.train import Trainer, TrainConfig

    ds = load_dataset("drugbank")
    data = prepare_device_data(ds, max_buckets=4)
    model = BiGNN(dataclasses.replace(
        BiGNNConfig.full_bignn(feat_dim=ds.feat_dim, dim=args.dim, heads=4),
        dtype=args.dtype))
    trainer = Trainer(model, data,
                      TrainConfig(lr=1e-3, epochs=1, batch_size=args.batch))
    params, opt_state = trainer.init()

    buckets = trainer.buckets
    gidx = trainer.graph_index
    outer = trainer.outer
    nb = [int((np.asarray(b.edge_dst) < b.node_cap).sum()) for b in buckets]
    print(f"buckets={[(b.node_cap, b.edge_cap) for b in buckets]} real_edges={nb}")
    print(f"outer edges={int((np.asarray(outer.edge_dst) < outer.num_nodes).sum())}"
          f" nodes={outer.num_nodes} dense={getattr(outer, 'dense_adj', None) is not None}")

    rng = np.random.default_rng(0)
    pairs = jnp.asarray(rng.integers(0, ds.num_drugs, (args.batch, 2)), jnp.int32)
    mask = jnp.ones(args.batch, jnp.float32)

    def embed_chain(k):
        def f(params):
            acc = jnp.float32(0)
            for i in range(k):
                p2 = jax.tree.map(
                    lambda x: x + acc * jnp.float32(1e-20) if jnp.issubdtype(x.dtype, jnp.floating) else x,
                    params)
                emb = model.embed_drugs(p2, buckets, gidx, ds.num_drugs)
                acc = acc + emb.sum().astype(jnp.float32)
            return acc
        return f

    emb0 = jax.jit(lambda p: model.embed_drugs(p, buckets, gidx, ds.num_drugs))(params)
    emb0 = jax.block_until_ready(emb0)

    def outer_chain(k):
        def f(params, emb):
            acc = jnp.float32(0)
            for _ in range(k):
                out = model.propagate_outer(params, emb + acc * jnp.float32(1e-20), outer)
                acc = acc + out.sum().astype(jnp.float32)
            return acc
        return f

    def score_chain(k):
        def f(params, emb):
            acc = jnp.float32(0)
            for _ in range(k):
                logits = model.score_pairs(params, emb + acc * jnp.float32(1e-20), pairs)
                acc = acc + logits.sum().astype(jnp.float32)
            return acc
        return f

    def fwd_chain(k):
        def f(params):
            acc = jnp.float32(0)
            for _ in range(k):
                p2 = jax.tree.map(
                    lambda x: x + acc * jnp.float32(1e-20) if jnp.issubdtype(x.dtype, jnp.floating) else x,
                    params)
                emb = model.embed_drugs(p2, buckets, gidx, ds.num_drugs)
                out = model.propagate_outer(p2, emb, outer)
                logits = model.score_pairs(p2, out, pairs)
                acc = acc + logits.sum().astype(jnp.float32)
            return acc
        return f

    def step_chain(k):
        def f(params, opt_state):
            acc = jnp.float32(0)
            key = jax.random.key(0)
            for i in range(k):
                key, sub = jax.random.split(key)
                p2 = jax.tree.map(
                    lambda x: x + acc * jnp.float32(1e-20) if jnp.issubdtype(x.dtype, jnp.floating) else x,
                    params)
                _, _, loss = trainer._step(p2, opt_state, sub, pairs, mask)
                acc = acc + loss
            return acc
        return f

    bench(embed_chain, "inner fwd (all buckets)", params)
    bench(outer_chain, "outer fwd", params, emb0)
    bench(score_chain, "score fwd", params, emb0)
    bench(fwd_chain, "full fwd", params)
    bench(step_chain, "full train step", params, opt_state)


if __name__ == "__main__":
    main()
