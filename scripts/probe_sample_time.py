"""Quick probe: amortized device-sampler draw time + sample+step time at
config #4 (the two numbers the sustained/ceiling ratio is made of).

Run on the TPU: python scripts/probe_sample_time.py
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import sys

import jax
import numpy as np

from scripts.profile_roofline import timed_scan
from bignn_tpu.data.datasets import load_npz_cache
from bignn_tpu.models import BiGNN, BiGNNConfig
from bignn_tpu.train import MinibatchTrainer, TrainConfig


def main():
    cache = _os.path.join(_os.path.dirname(__file__), "..", ".cache",
                          "config4_100000.npz")
    ds = load_npz_cache(cache, "config4")
    model = BiGNN(dataclasses.replace(
        BiGNNConfig.full_bignn(feat_dim=32, dim=128, heads=4),
        dtype="bfloat16"))
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    md = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    tr = MinibatchTrainer(
        model, ds, TrainConfig(lr=1e-3, epochs=1, batch_size=bs),
        fanouts=(10,), max_drugs=md, device_sample=True,
        dispatch_chunk=8)
    s = tr.sampler
    print(f"bs={bs} D={s.drug_budget} NC={s.node_cap} EC={s.edge_cap} "
          f"OE={s.outer_edge_cap}", flush=True)
    e_per = s.mol_edge_counts
    cb = jax.jit(tr.dsampler.sample)(tr._dev_consts,
                                     tr.dsampler.key_at(0, 0))[0]
    inner_e = int(e_per[np.asarray(cb.nodes)[:int(cb.n_real)]].sum())
    outer_e = int((np.asarray(cb.outer_dst) < s.drug_budget).sum())
    eps = inner_e * 2 + outer_e * 1
    print(f"edges/step ~ {eps}", flush=True)
    dev = tr.dsampler
    consts = tr._dev_consts
    tb = tr.tables
    params, opt_state = tr.init()
    key0 = dev.key_at(0, 0)

    t_samp = timed_scan(
        lambda i, c: dev.sample(c, jax.random.fold_in(key0, i))[0], consts,
        n=32)
    print(f"sample: {t_samp*1e3:.2f} ms", flush=True)

    t_step = timed_scan(
        lambda i, p, o, c, tb: tr._step(
            p, o, dev.sample(c, jax.random.fold_in(key0, i))[0], tb),
        params, opt_state, consts, tb, n=32)
    print(f"sample+step: {t_step*1e3:.2f} ms -> {eps/t_step/1e6:.1f}M edges/s", flush=True)

    # official-style (params-CARRIED) scans: these serialize the step chain
    # like real training, matching scripts/bench_config4.py's definitions
    import time
    import jax.numpy as jnp

    cbs = [jax.jit(dev.sample)(consts, dev.key_at(9, j))[0] for j in range(8)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *cbs)

    @jax.jit
    def ceil_scan(p, o, st, tb):
        def body(carry, hb):
            p, o = carry
            p, o, loss = tr._step(p, o, hb, tb)
            return (p, o), loss
        (p, o), losses = jax.lax.scan(body, (p, o), st)
        return losses

    @jax.jit
    def sust_scan(p, o, c, tb, k0):
        def body(carry, i):
            p, o = carry
            hb, _ = dev.sample(c, jax.random.fold_in(k0, i))
            p, o, loss = tr._step(p, o, hb, tb)
            return (p, o), loss
        (p, o), losses = jax.lax.scan(
            body, (p, o), jnp.arange(32, dtype=jnp.int32))
        return losses

    np.asarray(ceil_scan(params, opt_state, stacked, tb))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(ceil_scan(params, opt_state, stacked, tb))
        best = min(best, (time.perf_counter() - t0) / 8)
    print(f"ceiling scan (carried): {best*1e3:.2f} ms -> "
          f"{eps/best/1e6:.1f}M", flush=True)
    np.asarray(sust_scan(params, opt_state, consts, tb, key0))
    bsust = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(sust_scan(params, opt_state, consts, tb, key0))
        bsust = min(bsust, (time.perf_counter() - t0) / 32)
    print(f"sustained scan (carried): {bsust*1e3:.2f} ms -> "
          f"{eps/bsust/1e6:.1f}M", flush=True)


if __name__ == "__main__":
    main()
