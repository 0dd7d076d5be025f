"""Amortized stage timing: run each stage K times inside ONE jit (varying an
input per iteration to defeat CSE), so the ~25-35ms tunnel sync floor is
divided by K instead of subtracted (the floor drifts minute-to-minute).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

K = 8

def timed(make_body, *args, n=5, name=""):
    """make_body(i, *args) -> pytree; summed-to-scalar, scanned K times."""
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
        t0 = time.perf_counter(); np.asarray(jfn(*args)); ts.append(time.perf_counter()-t0)
    # subtract a fresh floor estimate around the same seconds
    print(f"{name:26s} {float(np.median(ts))/K*1e3:9.2f} ms/iter (incl floor/{K})", flush=True)

def main():
    from bignn_tpu.data.datasets import load_npz_cache
    from bignn_tpu.models import BiGNN, BiGNNConfig
    from bignn_tpu.train import MinibatchTrainer, TrainConfig
    cache = _os.path.join(_os.path.dirname(__file__), "..", ".cache", "config4_100000.npz")
    ds = load_npz_cache(cache, "config4")
    import dataclasses
    model = BiGNN(dataclasses.replace(
        BiGNNConfig.full_bignn(feat_dim=32, dim=128, heads=4),
        dtype="bfloat16"))
    tr = MinibatchTrainer(model, ds, TrainConfig(lr=1e-3, epochs=1, batch_size=1024),
                          fanouts=(10, 5), max_drugs=16384)
    s = tr.sampler
    cb = jax.tree.map(jnp.asarray, s.sample_compact())
    tb = tr.tables
    D, NC, EC = cb.drug_budget, cb.node_cap, cb.edge_cap

    def vary(i, cb):
        # rotate the slot list so each iteration gathers different rows
        return cb.replace(nodes=jnp.roll(cb.nodes, i))

    timed(lambda i, cb, tb: tr._expand_compact(vary(i, cb), tb), cb, tb,
          name="expand")

    pb = jax.jit(tr._expand_compact)(cb, tb)
    params, opt_state = tr.init()
    timed(lambda i, p, pb: tr.model.encode_inner(
        p, pb.replace(node_feat=pb.node_feat + i)), params, pb, name="inner")
    timed(lambda i, p, cb, tb: tr._forward(p, vary(i, cb), tb),
          params, cb, tb, name="fwd")
    timed(lambda i, p, cb, tb: jax.grad(
        lambda q: jnp.sum(tr._forward(q, vary(i, cb), tb) ** 2))(p),
          params, cb, tb, name="grad fwd")

    from bignn_tpu.sparse.formats import OuterGraph
    def outer_fn(i, p, emb, cb, tb):
        og = tr._derive_outer(cb, tb)
        return tr.model.propagate_outer(p, emb + i, og)
    emb = jax.jit(lambda p, pb: tr.model.encode_inner(p, pb))(params, pb)
    timed(outer_fn, params, emb, cb, tb, name="outer")
    timed(lambda i, p, cb, tb: tr._step(p, opt_state, vary(i, cb), tb)[2],
          params, cb, tb, name="step")

    # pure gathers at real sizes, amortized
    erows = jnp.asarray(np.random.default_rng(0).integers(
        0, tb.edge_packed.shape[0], EC), jnp.int32)
    timed(lambda i, t, r: jnp.take(t, jnp.roll(r, i), axis=0, mode="clip"),
          tb.edge_packed, erows, name="packed gather (rand)")
    nrows = jnp.asarray(np.random.default_rng(1).integers(
        0, tb.feat.shape[0], NC), jnp.int32)
    timed(lambda i, t, r: jnp.take(t, jnp.roll(r, i), axis=0, mode="clip"),
          tb.feat, nrows, name="feat gather (rand)")

if __name__ == "__main__":
    main()
