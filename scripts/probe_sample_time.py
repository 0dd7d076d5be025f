"""Quick probe: amortized device-sampler draw time + sample+step time at
config #4 (the two numbers the sustained/ceiling ratio is made of).

Run on the TPU: python scripts/probe_sample_time.py
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses

import jax

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
    tr = MinibatchTrainer(
        model, ds, TrainConfig(lr=1e-3, epochs=1, batch_size=1024),
        fanouts=(10,), max_drugs=16384, device_sample=True,
        dispatch_chunk=8)
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
    print(f"sample+step: {t_step*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
