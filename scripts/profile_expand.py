"""Sub-stage timing of MinibatchTrainer._expand_compact on config #4 shapes,
with the axon-tunnel sync floor (~25 ms/D2H) measured and subtracted.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

_floor = None


def _measure_floor():
    global _floor
    tiny = jax.jit(lambda v: v + 1)
    x = jnp.ones((), jnp.float32)
    np.asarray(tiny(x))
    ts = []
    for _ in range(9):
        t0 = time.perf_counter()
        np.asarray(tiny(x))
        ts.append(time.perf_counter() - t0)
    _floor = float(np.median(ts))
    print(f"sync floor {_floor*1e3:8.2f} ms", flush=True)


def timed(fn, *args, n=7, name=""):
    jfn = jax.jit(lambda *a: jax.tree.reduce(
        lambda x, y: x + y,
        jax.tree.map(lambda l: jnp.ravel(l)[0].astype(jnp.float32), fn(*a)),
    ))
    np.asarray(jfn(*args))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(jfn(*args))
        times.append(time.perf_counter() - t0)
    print(f"{name:32s} {(float(np.median(times))-_floor)*1e3:9.2f} ms",
          flush=True)


def main():
    from bignn_tpu.data.datasets import load_npz_cache
    from bignn_tpu.models import BiGNN, BiGNNConfig
    from bignn_tpu.train import MinibatchTrainer, TrainConfig

    cache = _os.path.join(_os.path.dirname(__file__), "..", ".cache",
                          "config4_100000.npz")
    ds = load_npz_cache(cache, "config4")
    model = BiGNN(BiGNNConfig.full_bignn(feat_dim=32, dim=128, heads=4))
    tr = MinibatchTrainer(model, ds, TrainConfig(lr=1e-3, epochs=1,
                                                 batch_size=1024),
                          fanouts=(10, 5), max_drugs=16384)
    s = tr.sampler
    print(f"budget={s.drug_budget} node_cap={s.node_cap} edge_cap={s.edge_cap}")
    cb = jax.tree.map(jnp.asarray, s.sample_compact())
    tb = tr.tables
    D, NC, EC = cb.drug_budget, cb.node_cap, cb.edge_cap
    _measure_floor()

    rng = np.random.default_rng(0)
    erows = jnp.asarray(rng.integers(0, tb.edge_packed.shape[0], EC), jnp.int32)
    nrows = jnp.asarray(rng.integers(0, tb.feat.shape[0], NC), jnp.int32)
    eslot = jnp.asarray(np.sort(rng.integers(0, D, EC)), jnp.int32)
    nslot = jnp.asarray(np.sort(rng.integers(0, D, NC)), jnp.int32)
    etbl = jnp.asarray(rng.integers(0, 1000, (D + 1, 3)), jnp.int32)
    ntbl = jnp.asarray(rng.integers(0, 1000, (D, 3)), jnp.int32)

    timed(lambda t, r: jnp.take(t, r, axis=0, mode="clip"),
          tb.edge_packed, erows, name="edge_packed row gather ECx8")
    timed(lambda t, r: jnp.take(t, r, axis=0, mode="clip"),
          tb.feat, nrows, name="feat row gather NCxF")
    timed(lambda t, r: jnp.take(t, r, axis=0, mode="clip"),
          etbl, eslot, name="edge_tbl row gather ECx3")
    timed(lambda t, r: jnp.take(t, r, axis=0, mode="clip"),
          ntbl, nslot, name="node_tbl row gather NCx3")
    timed(lambda c: tr._rank_slots(c, NC), jnp.sort(
        jnp.asarray(rng.integers(0, NC, D), jnp.int32)), name="rank_slots NC")
    timed(lambda c: tr._rank_slots(c, EC), jnp.sort(
        jnp.asarray(rng.integers(0, EC, D), jnp.int32)), name="rank_slots EC")

    # node-feature where + masked take (the full node feature stage)
    rv = nslot < D // 2
    timed(lambda t, r, v: jnp.where(v[:, None],
                                    jnp.take(t, r, axis=0, mode="clip"), 0.0),
          tb.feat, nrows, rv, name="feat gather + where")

    timed(tr._expand_compact, cb, tb, name="FULL expand")

    # expand minus each big stage would need surgery; instead time a variant
    # with the packed gather swapped for zeros to see its in-context share
    import bignn_tpu.train.trainer as T

    def expand_nopacked(cb, tb):
        import dataclasses as dc
        tb2 = tb.replace(edge_packed=tb.edge_packed[:1])
        return tr._expand_compact(cb, tb2)

    timed(expand_nopacked, cb, tb, name="expand w/ 1-row packed tbl")

    def expand_nofeat(cb, tb):
        tb2 = tb.replace(feat=tb.feat[:1])
        return tr._expand_compact(cb, tb2)

    timed(expand_nofeat, cb, tb, name="expand w/ 1-row feat tbl")


if __name__ == "__main__":
    main()
