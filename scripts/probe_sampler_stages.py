"""Probe: device-sampler sub-stage timings + live composition at config #4.

Decomposes data/device_sampler.py::sample into its stages and times each
with the roofline harness (timed_scan), plus prints the LIVE counts
(n_seeds, per-hop unique/keep, outer unique) that decide which sorts are
prunable. Round-4 perf work (VERDICT item 1) starts from this data.

Run on the TPU: python scripts/probe_sampler_stages.py

NOTE: this probe snapshots the r3 pipeline for comparison; the product
sampler (data/device_sampler.py) has since moved to window sampling over a
16-aligned shuffled adjacency and join-dedup. The flat adjacency here is
recovered by reshape so the r3 measurements stay reproducible.
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
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
    tr = MinibatchTrainer(
        model, ds, TrainConfig(lr=1e-3, epochs=1, batch_size=1024),
        fanouts=(10, 5), max_drugs=16384, device_sample=True,
        dispatch_chunk=8)
    dev = tr.dsampler
    consts = tr._dev_consts
    N, D = dev.N, dev.D
    print(f"N={N} D={D} fcaps={dev.fcaps} U={dev.U} OE={dev.OE} "
          f"pair_cap={dev.pair_cap} T={dev.T}", flush=True)

    key0 = dev.key_at(0, 0)

    # ---- live composition: re-run the pipeline stages eagerly -----------
    i32 = jnp.int32

    def seeds_of(key):
        kp, kn, *khop = jax.random.split(key, 2 + len(dev.fanouts))
        bs = dev.batch_size
        pos = jnp.take(consts.train_pairs,
                       jax.random.randint(kp, (bs,), 0, dev.T), axis=0)
        negs = []
        for kr in jax.random.split(kn, dev.neg_ratio):
            k1, k2 = jax.random.split(kr)
            right = jax.random.uniform(k1, (bs,)) < 0.5
            rand = jax.random.randint(k2, (bs,), 0, N)
            negs.append(jnp.stack(
                [jnp.where(right, pos[:, 0], rand),
                 jnp.where(right, rand, pos[:, 1])], axis=1))
        all_pairs = jnp.concatenate([pos] + negs).astype(i32)
        return all_pairs, khop

    def sorted_unique(x, sent):
        xs = jnp.sort(x)
        m = (xs < sent) & jnp.concatenate(
            [jnp.ones(1, bool), xs[1:] != xs[:-1]])
        return jnp.sort(jnp.where(m, xs, sent)), m.sum().astype(i32)

    all_pairs, khop = seeds_of(key0)
    seeds, n_seeds = sorted_unique(all_pairs.reshape(-1), N)
    print(f"n_seeds = {int(n_seeds)} / {all_pairs.size} endpoints", flush=True)

    seen = jnp.zeros(N + 1, bool).at[seeds].set(True)
    total = jnp.minimum(n_seeds, D)
    frontier = seeds[: dev.fcaps[0]]
    adj_flat = consts.adj_dst.reshape(-1)
    E = int(adj_flat.shape[0])
    es_sizes = []
    for h, fanout in enumerate(dev.fanouts):
        FC = dev.fcaps[h]
        fr = frontier
        frv = fr < N
        frc = jnp.minimum(fr, N - 1)
        lo = jnp.take(consts.adj_ptr, frc)
        deg = jnp.where(frv, jnp.take(consts.adj_ptr, frc + 1) - lo, 0)
        j = jnp.arange(fanout, dtype=i32)
        u = jax.random.uniform(khop[h], (FC, fanout))
        cols = jnp.where((deg <= fanout)[:, None],
                         jnp.broadcast_to(j, (FC, fanout)),
                         (u * deg[:, None]).astype(i32))
        cols = jnp.minimum(cols, jnp.maximum(deg[:, None] - 1, 0))
        ev = j[None, :] < deg[:, None]
        es = jnp.take(adj_flat,
                      jnp.clip(lo[:, None] + cols, 0, E - 1)).astype(i32)
        es = jnp.where(ev, es, N)
        cand = jnp.where(
            ev & ~jnp.take(seen, jnp.minimum(es, N)), es, N).reshape(-1)
        uvals, ucount = sorted_unique(cand, N)
        keep = jnp.minimum(ucount, D - total)
        es_sizes.append(int(cand.size))
        print(f"hop {h}: frontier_cap={FC} cand={cand.size} "
              f"valid_cand={int((cand < N).sum())} unique_new={int(ucount)} "
              f"keep={int(keep)} total_after={int(total + keep)}", flush=True)
        NF = dev.fcaps[h + 1]
        newf = jnp.where(jnp.arange(NF) < keep, uvals[:NF], N)
        seen = seen.at[newf].set(True)
        total = total + keep
        frontier = newf
    print(f"edge buffer total = {sum(es_sizes)}", flush=True)

    # full-sample composition via the production path
    cb, stats = jax.jit(dev.sample)(consts, key0)
    live_outer = int((np.asarray(cb.outer_dst) < D).sum())
    print(f"n_real={int(cb.n_real)} live_outer={live_outer} "
          f"stats={jax.tree.map(int, stats)}", flush=True)

    # ---- sub-stage timings ----------------------------------------------
    t = timed_scan(lambda i, c: dev.sample(
        c, jax.random.fold_in(key0, i))[0], consts, n=32)
    print(f"\nFULL sample: {t*1e3:.2f} ms", flush=True)

    t = timed_scan(lambda i, c: seeds_of(jax.random.fold_in(key0, i))[0],
                   consts, n=32)
    print(f"  pair draw only: {t*1e3:.2f} ms", flush=True)

    def upto_seeds(i, c):
        ap, _ = seeds_of(jax.random.fold_in(key0, i))
        s, n = sorted_unique(ap.reshape(-1), N)
        return s, n
    t = timed_scan(upto_seeds, consts, n=32)
    print(f"  pair draw + seed sorted_unique: {t*1e3:.2f} ms", flush=True)

    # single sort costs at the pipeline's sizes
    rng = np.random.default_rng(0)
    for sz in (4096, 16384, 36864, 40960, 81920, 83456, 122880):
        arr = jnp.asarray(rng.integers(0, N, sz), i32)
        ts = timed_scan(lambda i, a: jnp.sort(a + i), arr, n=32)
        ta = timed_scan(lambda i, a: jnp.argsort(a + i).astype(i32), arr, n=32)
        print(f"  sort[{sz}]: {ts*1e3:.2f} ms   argsort[{sz}]: {ta*1e3:.2f} ms",
              flush=True)

    # scatter costs (dedup/compaction alternatives)
    for sz, space in ((36864, D), (122880, D * D), (122880, 2 ** 20)):
        idx = jnp.asarray(rng.integers(0, min(space, 2**31 - 1), sz), i32)
        cap = min(space, 2 ** 20)
        t = timed_scan(
            lambda i, ix: jnp.zeros(cap, i32).at[
                jnp.minimum(ix + i * 0, cap - 1)].add(1), idx, n=32)
        print(f"  scatter-add[{sz} -> {cap} bins]: {t*1e3:.2f} ms", flush=True)
    # one-hot cumsum classpack alternative: [36864, C] cumsum
    C = dev.C
    cls = jnp.asarray(rng.integers(0, C, 36864), i32)
    def classpack(i, cls):
        oh = (cls[:, None] + i * 0 == jnp.arange(C)[None, :]).astype(i32)
        ranks = jnp.cumsum(oh, axis=0)
        return jnp.take_along_axis(ranks, cls[:, None], axis=1)[:, 0]
    t = timed_scan(classpack, cls, n=32)
    print(f"  one-hot-cumsum rank [36864 x C={C}]: {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
