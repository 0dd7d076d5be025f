"""Stage breakdown of the headline bench step (drugbank preset, bf16 Pallas).

Amortized timing: each stage runs K times inside one jit'd scan with a varied
input (defeats CSE), so the ~25ms tunnel floor divides by K.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

K = 16


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
    print(f"{name:28s} {float(np.median(ts))/K*1e3:9.3f} ms/iter", flush=True)


def main():
    from bignn_tpu.data import load_dataset, prepare_device_data
    from bignn_tpu.models import BiGNN, BiGNNConfig
    from bignn_tpu.train import Trainer, TrainConfig

    ds = load_dataset("drugbank")
    data = prepare_device_data(ds, max_buckets=4)
    model = BiGNN(dataclasses.replace(
        BiGNNConfig.full_bignn(feat_dim=ds.feat_dim, dim=64, heads=4),
        dtype="bfloat16"))
    trainer = Trainer(model, data, TrainConfig(lr=1e-3, epochs=1, batch_size=2048))
    params, opt_state = trainer.init()

    buckets = trainer.buckets
    gidx = trainer.graph_index
    outer = trainer.outer

    inner_edges = sum(int((np.asarray(b.edge_dst) < b.node_cap).sum())
                      for b in data.bucketing.batches)
    outer_edges = int((np.asarray(data.outer.edge_dst) < data.outer.num_nodes).sum())
    print(f"inner_edges={inner_edges}  outer_edges={outer_edges}  "
          f"edges/step={inner_edges*2 + outer_edges}")

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.integers(0, ds.num_drugs, (2048, 2)), jnp.int32)
    mask = jnp.ones(2048, jnp.float32)
    key = jax.random.key(0)

    # full train step
    timed(lambda i, p, o: trainer._step(p, o, jax.random.fold_in(key, i), pos, mask)[:2],
          params, opt_state, name="full step")

    # forward-only loss
    def fwd(i, p):
        logits = model.apply(p, buckets, gidx, outer, pos + i % 2)
        return (logits.sum(),)
    timed(fwd, params, name="fwd (scored pairs)")

    # inner encode only
    def inner(i, p):
        embs = model.embed_drugs(p, tuple(
            dataclasses.replace(b, node_feat=b.node_feat + i) for b in buckets),
            gidx, outer.num_nodes)
        return (embs.sum(),)
    timed(inner, params, name="inner embed_drugs")

    def enc(i, p):
        embs = model.embed_drugs(p, tuple(
            dataclasses.replace(b, node_feat=b.node_feat + i) for b in buckets),
            gidx, outer.num_nodes)
        return (model.propagate_outer(p, embs, outer).sum(),)
    timed(enc, params, name="inner+outer")

    # grad of full loss
    def gstep(i, p):
        def loss_fn(pp):
            logits = model.apply(pp, buckets, gidx, outer, pos + i % 2)
            return logits.sum()
        return (jax.grad(loss_fn)(p),)
    timed(gstep, params, name="fwd+bwd (grad)")


if __name__ == "__main__":
    main()
