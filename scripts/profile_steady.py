"""One-off: break the config-#4 steady-loop overhead into stages.

Times, per chunk of K steps: host sample (worker-side), np.stack,
jnp.asarray H2D, train_chunk dispatch, loss D2H — to find where the
sustained-vs-ceiling gap (42 ms vs 26.4 ms/step measured r3) goes.
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bignn_tpu.data.datasets import load_npz_cache
from bignn_tpu.models import BiGNN, BiGNNConfig
from bignn_tpu.train import MinibatchTrainer, TrainConfig

ds = load_npz_cache(_os.path.join(_os.path.dirname(__file__), "..", ".cache", "config4_100000.npz"), "config4")
model = BiGNN(dataclasses.replace(
    BiGNNConfig.full_bignn(feat_dim=32, dim=128, heads=4), dtype="bfloat16"))
tr = MinibatchTrainer(model, ds, TrainConfig(lr=1e-3, epochs=1, batch_size=1024),
                      fanouts=(10, 5), max_drugs=16384)
s = tr.sampler
params, opt_state = tr.init()

K = 8
# warm/compile the chunk scan
warm = [s.sample_compact_at(9, i) for i in range(K)]
params, opt_state, _ = tr._flush(params, opt_state, list(warm), [])

# presample 3 chunks of host batches
chunks = [[s.sample_compact_at(0, c * K + i) for i in range(K)] for c in range(3)]

# stage timings (main thread, nothing else running)
for rep in range(3):
    t = {}
    pend = chunks[rep]
    t0 = time.perf_counter()
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *pend)
    t["np.stack"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    hbs = jax.tree.map(jnp.asarray, stacked)
    t["jnp.asarray (dispatch)"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(hbs)
    t["H2D (block)"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    params, opt_state, ls = tr.train_chunk(params, opt_state, hbs)
    t["train_chunk dispatch"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    lslist = list(ls)
    t["list(ls)"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    _ = float(lslist[-1])
    t["loss D2H (incl compute wait)"] = time.perf_counter() - t0
    print({k: round(v * 1e3, 1) for k, v in t.items()}, flush=True)

# bytes per chunk H2D
nbytes = sum(x.nbytes for x in jax.tree.leaves(stacked))
print(f"chunk H2D bytes: {nbytes/1e6:.1f} MB", flush=True)

# sampling throughput with 1..3 threads (GIL/2-CPU reality check)
from bignn_tpu.data.prefetch import ParallelPrefetcher
for w in (1, 2, 3):
    n = 16
    t0 = time.perf_counter()
    for _ in ParallelPrefetcher(lambda i: s.sample_compact_at(1, i), n, workers=w):
        pass
    dt = (time.perf_counter() - t0) / n
    print(f"sampling with workers={w}: {dt*1e3:.1f} ms/batch", flush=True)
