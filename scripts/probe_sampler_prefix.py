"""Probe 2: cumulative prefix timings of the device-sampler pipeline.

probe_sampler_stages.py showed a ~0.7 ms scan-iteration floor that hides
individual op costs; this probe times PREFIXES of the real pipeline so the
differences expose true per-stage costs at config #4.

Run on the TPU: python scripts/probe_sampler_prefix.py

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
    N, D, C = dev.N, dev.D, dev.C
    i32 = jnp.int32
    key0 = dev.key_at(0, 0)
    adj_flat = consts.adj_dst.reshape(-1)
    E = int(adj_flat.shape[0])
    print(f"E(adj)={E}", flush=True)

    def sorted_unique(x, sent):
        xs = jnp.sort(x)
        m = (xs < sent) & jnp.concatenate(
            [jnp.ones(1, bool), xs[1:] != xs[:-1]])
        return jnp.sort(jnp.where(m, xs, sent)), m.sum().astype(i32)

    # pipeline as a sequence of named stages; stage k returns everything
    # later stages need. Prefix timing = timed_scan over stages[:k].
    def pipeline(key, upto):
        out = []
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
        if upto == "pairs":
            return all_pairs
        seeds, n_seeds = sorted_unique(all_pairs.reshape(-1), N)
        if upto == "seeds":
            return seeds, n_seeds
        seen = jnp.zeros(N + 1, bool).at[seeds].set(True)
        total = jnp.minimum(n_seeds, D)
        segs = [(seeds, jnp.arange(seeds.shape[0]) < n_seeds)]
        es_bufs, ed_bufs = [], []
        hop_dropped = jnp.zeros((), i32)
        frontier = seeds[: dev.fcaps[0]]
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
            ed = jnp.where(ev, jnp.broadcast_to(fr[:, None], (FC, fanout)), N)
            es_bufs.append(es.reshape(-1))
            ed_bufs.append(ed.reshape(-1))
            if upto == f"expand{h}_nosort":
                return es, ed
            cand = jnp.where(
                ev & ~jnp.take(seen, jnp.minimum(es, N)), es, N).reshape(-1)
            uvals, ucount = sorted_unique(cand, N)
            keep = jnp.minimum(ucount, D - total)
            NF = dev.fcaps[h + 1]
            newf = jnp.where(jnp.arange(NF) < keep, uvals[:NF], N)
            hop_dropped += ucount - keep
            seen = seen.at[newf].set(True)
            segs.append((newf, newf < N))
            total += keep
            frontier = newf
            if upto == f"hop{h}":
                return frontier, seen, total
        seg_counts = [n_seeds] + [jnp.sum(v).astype(i32) for _, v in segs[1:]]
        p = jnp.arange(D, dtype=i32)
        nodes_bfs = jnp.zeros(D, i32)
        start = jnp.zeros((), i32)
        for (seg_arr, _), cnt in zip(segs, seg_counts):
            idx = p - start
            take = (idx >= 0) & (idx < cnt)
            nodes_bfs = jnp.where(
                take, jnp.take(seg_arr, jnp.clip(idx, 0, seg_arr.shape[0] - 1)),
                nodes_bfs)
            start = start + cnt
        nvalid = p < start
        eq = jnp.where(nvalid, jnp.take(consts.qe, nodes_bfs), 0)
        keep_e = jnp.sum(nvalid & (jnp.cumsum(eq) <= dev.EC)).astype(i32)
        nvalid = nvalid & (jnp.arange(D) < keep_e)
        if upto == "nodelist":
            return nodes_bfs, nvalid
        qn = jnp.where(nvalid, jnp.take(consts.qn, nodes_bfs), 0)
        cls = jnp.where(
            nvalid, jnp.take(consts.cls_of_size, jnp.minimum(
                qn, consts.cls_of_size.shape[0] - 1)), C)
        order2 = jnp.argsort(cls, stable=True)
        cls_s = jnp.take(cls, order2)
        nodes_p = jnp.take(nodes_bfs, order2)
        qn_s = jnp.take(qn, order2)
        pvalid = cls_s < C
        cnt = jnp.zeros(C + 1, i32).at[cls_s].add(1)[:C]
        pb = consts.class_pb
        blocks = -(-cnt // pb)
        base = 128 * (jnp.cumsum(blocks) - blocks)
        pos0 = jnp.cumsum(cnt) - cnt
        cidx = jnp.minimum(cls_s, C - 1)
        r = jnp.arange(D, dtype=i32) - jnp.take(pos0, cidx)
        off = (jnp.take(base, cidx)
               + (r // jnp.take(pb, cidx)) * 128
               + (r % jnp.take(pb, cidx)) * jnp.take(consts.class_size, cidx))
        fits = pvalid & (off + qn_s <= dev.NC)
        nvalid_p = fits
        n_real = jnp.sum(nvalid_p).astype(i32)
        off = jnp.where(nvalid_p, off, dev.NC)
        nodes_out = jnp.where(nvalid_p, nodes_p, 0).astype(i32)
        nblocks = dev.NC // 128
        blk = jnp.minimum(off // 128, nblocks)
        hist = jnp.zeros(nblocks + 1, i32).at[blk].add(nvalid_p.astype(i32))
        block_slot0 = jnp.concatenate(
            [jnp.zeros(1, i32), jnp.cumsum(hist)[:-1]])
        local = jnp.full(N + 1, D, i32).at[
            jnp.where(nvalid_p, nodes_out, N)
        ].set(jnp.where(nvalid_p, jnp.arange(D, dtype=i32), D))
        if upto == "classpack":
            return nodes_out, off, block_slot0, local
        es = jnp.concatenate(es_bufs)
        ed = jnp.concatenate(ed_bufs)
        la = jnp.take(local, jnp.minimum(es, N))
        lb = jnp.take(local, jnp.minimum(ed, N))
        ok = (la < D) & (lb < D) & (la != lb)
        sent = D * D
        keyv = jnp.where(
            ok, jnp.minimum(la, lb) * D + jnp.maximum(la, lb), sent)
        if upto == "keyv":
            return keyv
        kuniq, ucnt = sorted_unique(keyv, sent)
        if upto == "outer_dedup":
            return kuniq, ucnt
        kept = jnp.minimum(ucnt, dev.U)
        ku = kuniq[: dev.U]
        uval = jnp.arange(dev.U) < kept
        p0 = jnp.where(uval, ku // D, D)
        p1 = jnp.where(uval, ku % D, D)
        slot = jnp.arange(D, dtype=i32)
        loops = jnp.where(slot < n_real, slot, D)
        su = jnp.concatenate([p0, p1, loops])
        sv = jnp.concatenate([p1, p0, loops])
        o3 = jnp.argsort(sv, stable=True)
        sv_s = jnp.take(sv, o3)
        su_s = jnp.where(sv_s < D, jnp.take(su, o3), 0)
        return su_s, sv_s

    stages = ["pairs", "seeds", "expand0_nosort", "hop0", "expand1_nosort",
              "hop1", "nodelist", "classpack", "keyv", "outer_dedup", "all"]
    prev = 0.0
    for st in stages:
        t = timed_scan(
            lambda i, c, st=st: pipeline(jax.random.fold_in(key0, i), st),
            consts, n=32)
        print(f"  upto {st:16s}: {t*1e3:6.2f} ms  (+{(t*1e3)-prev:5.2f})",
              flush=True)
        prev = t * 1e3


if __name__ == "__main__":
    main()
