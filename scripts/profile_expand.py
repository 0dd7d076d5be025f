"""Sub-stage timing of MinibatchTrainer._expand_compact on config #4 shapes.

Single-scalar sync (one D2H per measurement) so tunnel latency doesn't
smear across multi-output stages.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=7, name=""):
    jfn = jax.jit(lambda *a: jax.tree.reduce(
        lambda x, y: x + y,
        jax.tree.map(lambda l: jnp.ravel(l)[0].astype(jnp.float32), fn(*a)),
    ))
    out = jfn(*args)
    np.asarray(out)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = jfn(*args)
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    print(f"{name:30s} {float(np.median(times))*1e3:9.2f} ms", flush=True)


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
    NC, EC = cb.node_cap, cb.edge_cap

    rng = np.random.default_rng(0)
    erows = jnp.asarray(rng.integers(0, tb.edge_packed.shape[0], EC), jnp.int32)
    nrows = jnp.asarray(rng.integers(0, tb.feat.shape[0], NC), jnp.int32)

    timed(lambda t, r: jnp.take(t, r, axis=0, mode="clip"),
          tb.edge_packed, erows, name="edge_packed row gather ECx8")
    timed(lambda t, r: jnp.take(t, r, axis=0, mode="clip"),
          tb.feat, nrows, name="feat row gather NCxF")
    timed(tr._expand_compact, cb, tb, name="FULL expand")


if __name__ == "__main__":
    main()
