"""Stage-by-stage timing of the config #4 train step (device-bound per
scripts/bench_config4.py: 884ms device vs 58ms host). Isolates:

  expand   — CompactBatch -> PaddedGraphBatch on-device ragged expansion
  inner    — encode_inner (k GIN layers + readout)
  outer    — propagate_outer (GAT over sampled outer subgraph)
  score    — pair gather + scorer
  fwd      — full forward
  step     — full train step (fwd + bwd + adam)

Builds the 100K-drug dataset once and caches it in .cache/config4.npz.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _floor_and_timed():
    """Single-scalar sync + measured sync-floor subtraction: under the axon
    tunnel every D2H costs ~25 ms, which would swamp sub-50ms stages."""
    import numpy as np

    _tiny = jax.jit(lambda v: v + 1)
    x = jnp.ones((), jnp.float32)
    np.asarray(_tiny(x))
    ts = []
    for _ in range(9):
        t0 = time.perf_counter()
        np.asarray(_tiny(x))
        ts.append(time.perf_counter() - t0)
    floor = float(np.median(ts))
    print(f"sync floor {floor*1e3:8.2f} ms", flush=True)

    def timed(fn, *args, n=7, name=""):
        jfn = jax.jit(lambda *a: jax.tree.reduce(
            lambda p, q: p + q,
            jax.tree.map(lambda l: jnp.ravel(l)[0].astype(jnp.float32),
                         fn(*a)),
        ))
        np.asarray(jfn(*args))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(jfn(*args))
            ts.append(time.perf_counter() - t0)
        dt = (float(np.median(ts)) - floor) * 1000
        print(f"{name:10s} {dt:9.2f} ms", flush=True)
        return dt

    return timed


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-drugs", type=int, default=100_000)
    p.add_argument("--avg-degree", type=float, default=200.0)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--fanouts", default="10,5")
    p.add_argument("--max-drugs", type=int, default=16384)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    args = p.parse_args()

    from bignn_tpu.data import make_synthetic_ddi
    from bignn_tpu.data.datasets import load_npz_cache, save_npz_cache
    from bignn_tpu.models import BiGNN, BiGNNConfig
    from bignn_tpu.sparse.formats import OuterGraph
    from bignn_tpu.train import MinibatchTrainer, TrainConfig

    cache = _os.path.join(_os.path.dirname(__file__), "..", ".cache",
                          f"config4_{args.num_drugs}.npz")
    t0 = time.perf_counter()
    if _os.path.exists(cache):
        ds = load_npz_cache(cache, "config4")
        print(f"dataset loaded from cache in {time.perf_counter()-t0:.1f}s")
    else:
        ds = make_synthetic_ddi(
            num_drugs=args.num_drugs, feat_dim=32, avg_degree=args.avg_degree,
            min_atoms=8, max_atoms=40, latent_dim=8, seed=0, name="config4",
        )
        tmp = cache.replace(".npz", ".tmp.npz")
        save_npz_cache(ds, tmp)
        _os.replace(tmp, cache)  # atomic: no truncated caches
        print(f"dataset built in {time.perf_counter()-t0:.1f}s (cached)")

    fanouts = tuple(int(x) for x in args.fanouts.split(","))
    import dataclasses
    model = BiGNN(dataclasses.replace(
        BiGNNConfig.full_bignn(feat_dim=32, dim=args.dim, heads=4),
        dtype=args.dtype))
    tr = MinibatchTrainer(
        model, ds, TrainConfig(lr=1e-3, epochs=1, batch_size=args.batch),
        fanouts=fanouts, max_drugs=args.max_drugs,
    )
    s = tr.sampler
    print(f"budget={s.drug_budget} node_cap={s.node_cap} edge_cap={s.edge_cap} "
          f"outer_cap={s.outer_edge_cap}", flush=True)
    timed = _floor_and_timed()
    params, opt_state = tr.init()
    cb = jax.tree.map(jnp.asarray, s.sample_compact())
    tb = tr.tables

    expand = jax.jit(tr._expand_compact)
    pb = expand(cb, tb)

    def inner(params, pb):
        return tr.model.encode_inner(params, pb)

    inner_j = jax.jit(inner)
    emb = inner_j(params, pb)

    def outer(params, emb, cb, tb):
        og = tr._derive_outer(cb, tb)
        return tr.model.propagate_outer(params, emb, og)

    outer_j = jax.jit(outer)
    emb2 = outer_j(params, emb, cb, tb)

    score_j = jax.jit(lambda params, emb2, cb: tr.model.score_pairs(params, emb2, cb.pairs))
    fwd_j = jax.jit(tr._forward)

    timed(expand, cb, tb, name="expand")
    timed(inner_j, params, pb, name="inner")
    timed(outer_j, params, emb, cb, name="outer")
    timed(score_j, params, emb2, cb, name="score")
    timed(fwd_j, params, cb, tb, name="fwd")

    # backward brackets: grad of progressively larger slices
    inner_g = jax.jit(jax.grad(lambda p, pb: jnp.sum(inner(p, pb) ** 2)))
    timed(inner_g, params, pb, name="grad inner")
    outer_g = jax.jit(jax.grad(lambda p, emb, cb: jnp.sum(outer(p, emb, cb) ** 2)))
    timed(outer_g, params, emb, cb, name="grad outer")
    full_g = jax.jit(jax.grad(lambda p, cb, tb: jnp.sum(tr._forward(p, cb, tb) ** 2)))
    timed(full_g, params, cb, tb, name="grad fwd")
    timed(lambda p, o, c, t: tr._step(p, o, c, t), params, opt_state, cb, tb,
          name="step")


if __name__ == "__main__":
    main()
