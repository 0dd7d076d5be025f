"""Device-resident hierarchical sampling (SURVEY.md T4, config #4).

The host sampler (hierarchical.py) costs ~20 ms/step of host CPU at
config-#4 scale plus ~0.5-2 MB/step of H2D — on thin-host machines (this
environment: 2 CPUs, ~75 MB/s tunnel H2D) that is THE sustained-throughput
bottleneck: r2/r3 measured 42-46 ms/step sustained vs a 26-27 ms pure-device
ceiling. This module moves the ENTIRE per-step sampling pipeline into the
jitted step so an epoch runs as a device-only `lax.scan` — zero per-step
host work, zero per-step H2D, sustained == ceiling by construction.

Pipeline per step (all static shapes, one `jax.random` key):
  1. positive pair draw + negative endpoint corruption;
  2. L-hop fanout neighbor expansion over the resident train-graph CSR
     (full neighborhood when degree <= fanout, with-replacement draws
     otherwise — the host sampler's exact per-node rule);
  3. sort-based dedup per hop + seed-preserving budget truncation
     (ascending unique order == the host's np.unique prefix order);
  4. CLASS-PACKED block layout: molecules sorted by quantized size class,
     each class packed `floor(128/size)` per 128-row block. This replaces
     the host's sequential greedy packer (native.greedy_pack_blocks) with a
     fully parallel rank computation — same invariants (offsets
     non-decreasing, multiples of r_node, no molecule straddles a block),
     different slot order (size-class-major instead of BFS), which only
     permutes slot ids;
  5. outer-subgraph construction: canonical-pair dedup of the sampled tree
     edges, both directions + live self-loops, stable-sorted by dst.

The emitted CompactBatch is bitwise-compatible with the trainer's resident
expansion (_expand_compact); outer weights/src-sort stay device-derived
(MinibatchTrainer._derive_outer). Draws are a pure function of
(seed, epoch, step) via fold_in — the trajectory is deterministic,
order-independent, and checkpoint-resume exact, mirroring
HierarchicalSampler.sample_compact_at. The node/pair SETS differ from the
host sampler's draws (different RNG streams and packing order), so the two
modes are separate-but-equivalent estimators, not bit-identical.

Reference: the PyG/torch-cluster `NeighborSampler` host loop this replaces
(SURVEY.md §2.1 R6) has no device-side analogue in the reference — this is
new TPU-first scope.

MEASURED DEAD END (r3) — chunk-batched sampling: drawing K steps' batches
in one fused call (vmap of sample, and a hand-batched rewrite with axis -1
sorts + flat [K*(N+1)] scatter tables) both LOSE to this sequential
implementation on the attached chip: sorts amortize beautifully
(1.5 -> 0.3 ms/row at K=8) but batching overhead swamps the win — vmapped
B=1 measured 14.8 ms/step, hand-batched B=1 14.4, hand-batched K=8
10.0 ms/step vs 8.4 sequential (element gathers are linear in K, and
batched-op lowering carries per-op costs the 1D forms don't). Keep sorts
1D and the scan sequential.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SamplerConsts(NamedTuple):
    """Device-resident constants (uploaded once, ~O(E) int32)."""

    adj_ptr: jax.Array  # [N+1] int32 undirected train-graph CSR
    adj_dst: jax.Array  # [E] int32
    train_pairs: jax.Array  # [T, 2] int32 positive train edges
    qn: jax.Array  # [N] int32 quantized molecule node counts
    qe: jax.Array  # [N] int32 quantized molecule edge counts
    cls_of_size: jax.Array  # [max_qn+1] int32 size -> class id
    class_size: jax.Array  # [C] int32 ascending distinct quantized sizes
    class_pb: jax.Array  # [C] int32 molecules per 128-row block


class DeviceSampler:
    """Jittable sampler built over a calibrated HierarchicalSampler.

    Reuses the host sampler's caps (drug_budget/node_cap/edge_cap/
    outer_edge_cap — including its empirical calibration) and its molecule
    tables; only the per-step draw moves on device. Requires the
    block-local quantized layout (the class packer needs molecules <= 128
    rows; GAT-inner non-quantized layouts keep the host path).
    """

    def __init__(self, host_sampler):
        s = host_sampler
        if not getattr(s, "block_local", False):
            raise ValueError(
                "DeviceSampler requires the block-local layout "
                "(molecules <= 128 rows); use the host sampler otherwise")
        self.host = s
        self.N = int(s.num_nodes)
        self.D = int(s.drug_budget)
        self.NC = int(s.node_cap)
        self.EC = int(s.edge_cap)
        self.OE = int(s.outer_edge_cap)
        self.batch_size = int(s.batch_size)
        self.neg_ratio = int(s.neg_ratio)
        self.pair_cap = int(s.pair_cap)
        self.fanouts = tuple(int(f) for f in s.fanouts)
        self.r_node = int(s.r_node)
        self.T = int(len(s.train_pairs))
        self.seed = int(s.seed)
        # per-hop frontier caps: seeds, then min(D, prev*fanout)
        caps = [min(self.pair_cap * 2, max(self.D, 1))]
        for f in self.fanouts:
            caps.append(min(self.D, caps[-1] * f))
        self.fcaps = caps
        # undirected dedup cap: su/sv = both directions + D self loops must
        # fit the host-calibrated outer_edge_cap exactly; also bounded by
        # the total sampled-edge buffer (on small graphs the calibrated OE
        # can exceed every edge the hops could possibly produce)
        e_total = sum(self.fcaps[h] * f for h, f in enumerate(self.fanouts))
        self.U = max(min((self.OE - self.D) // 2, e_total), 1)
        # the canonical-pair dedup key is lo*D + hi < D*D in int32; the host
        # sampler covers larger budgets in int64 (x64 is off on TPU)
        if self.D > 46340:  # floor(sqrt(2^31 - 1))
            raise ValueError(
                f"drug_budget {self.D} overflows the int32 pair-dedup key "
                "space (D*D >= 2^31); cap it with max_drugs <= 46340 or use "
                "the host sampler")
        self.idt = jnp.int16 if self.D <= np.iinfo(np.int16).max else jnp.int32

        qn = np.diff(s._mol_qptr).astype(np.int32)
        qe = np.diff(s._tbl_eptr).astype(np.int32)
        sizes = np.unique(qn[qn > 0])
        if sizes.size == 0 or int(sizes.max()) > 128:
            raise ValueError("class packer needs 0 < quantized size <= 128")
        cls_of_size = np.zeros(int(sizes.max()) + 1, np.int32)
        cls_of_size[sizes] = np.arange(len(sizes), dtype=np.int32)
        self.C = int(len(sizes))
        self._consts_np = SamplerConsts(
            adj_ptr=s._adj_ptr.astype(np.int32),
            adj_dst=s._adj_dst.astype(np.int32),
            train_pairs=s.train_pairs.astype(np.int32),
            qn=qn,
            qe=qe,
            cls_of_size=cls_of_size,
            class_size=sizes.astype(np.int32),
            class_pb=(128 // sizes).astype(np.int32),
        )

    def constants(self) -> SamplerConsts:
        """NumPy constants; callers jax.device_put once."""
        return self._consts_np

    def key_at(self, epoch: int, step) -> jax.Array:
        """The (seed, epoch, step)-derived PRNG key (fold_in chain)."""
        k = jax.random.fold_in(jax.random.key(self.seed), epoch)
        return jax.random.fold_in(k, step)

    # -- the jittable draw -------------------------------------------------
    def sample(self, consts: SamplerConsts, key: jax.Array):
        """One CompactBatch + truncation-stat scalars, fully on device."""
        from bignn_tpu.data.hierarchical import CompactBatch

        N, D, C = self.N, self.D, self.C
        i32 = jnp.int32
        kp, kn, *khop = jax.random.split(key, 2 + len(self.fanouts))

        # 1. pairs ---------------------------------------------------------
        bs = self.batch_size
        pos = jnp.take(
            consts.train_pairs,
            jax.random.randint(kp, (bs,), 0, self.T), axis=0)  # [bs, 2]
        negs = []
        for kr in jax.random.split(kn, self.neg_ratio):
            k1, k2 = jax.random.split(kr)
            right = jax.random.uniform(k1, (bs,)) < 0.5
            rand = jax.random.randint(k2, (bs,), 0, N)
            negs.append(jnp.stack(
                [jnp.where(right, pos[:, 0], rand),
                 jnp.where(right, rand, pos[:, 1])], axis=1))
        all_pairs = jnp.concatenate([pos] + negs).astype(i32)  # [pair_cap,2]
        labels = jnp.concatenate([
            jnp.ones(bs, jnp.float32),
            jnp.zeros(bs * self.neg_ratio, jnp.float32)])

        # 2-3. seeds + hop expansion --------------------------------------
        def sorted_unique(x, sent):
            """Ascending unique of x (sentinel-padded), sentinel tail.

            The compaction is a SECOND sort on purpose: TPU sorts cost
            ~1.5-2 ms near-independent of size while the alternatives
            measured WORSE in r3 — jnp.searchsorted's scan lowering took
            this path from 8.4 to 39.9 ms/step, and cumsum+scatter
            compaction benches at sort-cost (~2 ms) anyway."""
            xs = jnp.sort(x)
            m = (xs < sent) & jnp.concatenate(
                [jnp.ones(1, bool), xs[1:] != xs[:-1]])
            return jnp.sort(jnp.where(m, xs, sent)), m.sum().astype(i32)

        seeds, n_seeds = sorted_unique(all_pairs.reshape(-1), N)
        seen = jnp.zeros(N + 1, bool).at[seeds].set(True)  # sentinel row N
        total = jnp.minimum(n_seeds, D)
        segs = [(seeds, jnp.arange(seeds.shape[0]) < n_seeds)]
        es_bufs, ed_bufs = [], []
        hop_dropped = jnp.zeros((), i32)
        frontier = seeds[: self.fcaps[0]]
        E = int(consts.adj_dst.shape[0])
        for h, fanout in enumerate(self.fanouts):
            FC = self.fcaps[h]
            fr = frontier
            frv = fr < N
            frc = jnp.minimum(fr, N - 1)
            lo = jnp.take(consts.adj_ptr, frc)
            deg = jnp.where(frv, jnp.take(consts.adj_ptr, frc + 1) - lo, 0)
            j = jnp.arange(fanout, dtype=i32)
            u = jax.random.uniform(khop[h], (FC, fanout))
            # host rule: whole neighborhood when deg <= fanout, else
            # `fanout` with-replacement draws
            cols = jnp.where(
                (deg <= fanout)[:, None],
                jnp.broadcast_to(j, (FC, fanout)),
                (u * deg[:, None]).astype(i32))
            cols = jnp.minimum(cols, jnp.maximum(deg[:, None] - 1, 0))
            ev = j[None, :] < deg[:, None]
            es = jnp.take(
                consts.adj_dst,
                jnp.clip(lo[:, None] + cols, 0, E - 1)).astype(i32)
            es = jnp.where(ev, es, N)
            ed = jnp.where(ev, jnp.broadcast_to(fr[:, None], (FC, fanout)), N)
            es_bufs.append(es.reshape(-1))
            ed_bufs.append(ed.reshape(-1))
            cand = jnp.where(
                ev & ~jnp.take(seen, jnp.minimum(es, N)), es, N).reshape(-1)
            uvals, ucount = sorted_unique(cand, N)
            keep = jnp.minimum(ucount, D - total)
            NF = self.fcaps[h + 1]
            newf = jnp.where(jnp.arange(NF) < keep, uvals[:NF], N)
            hop_dropped += ucount - keep
            seen = seen.at[newf].set(True)
            segs.append((newf, newf < N))
            total += keep
            frontier = newf

        # BFS-segment node list. Every segment is already prefix-valid
        # (sorted_unique / the keep-prefix construction), so compaction is
        # pure segment arithmetic — no argsort: position p draws from the
        # segment whose [start, start+count) range covers it.
        seg_counts = [n_seeds] + [
            jnp.sum(v).astype(i32) for _, v in segs[1:]]
        p = jnp.arange(D, dtype=i32)
        nodes_bfs = jnp.zeros(D, i32)
        start = jnp.zeros((), i32)
        for (seg_arr, _), cnt in zip(segs, seg_counts):
            idx = p - start
            take = (idx >= 0) & (idx < cnt)
            nodes_bfs = jnp.where(
                take,
                jnp.take(seg_arr, jnp.clip(idx, 0, seg_arr.shape[0] - 1)),
                nodes_bfs)
            start = start + cnt
        nvalid = p < start  # == total (seg counts already budget-capped)

        # edge-cap prefix truncation (BFS order, seeds first — host line
        # hierarchical.py:561)
        eq = jnp.where(nvalid, jnp.take(consts.qe, nodes_bfs), 0)
        keep_e = jnp.sum(nvalid & (jnp.cumsum(eq) <= self.EC)).astype(i32)
        ecap_dropped = jnp.sum(nvalid).astype(i32) - keep_e
        nvalid = nvalid & (jnp.arange(D) < keep_e)

        # 4. class-packed layout ------------------------------------------
        qn = jnp.where(nvalid, jnp.take(consts.qn, nodes_bfs), 0)
        cls = jnp.where(
            nvalid, jnp.take(consts.cls_of_size, jnp.minimum(
                qn, consts.cls_of_size.shape[0] - 1)), C)
        order2 = jnp.argsort(cls, stable=True)
        cls_s = jnp.take(cls, order2)
        nodes_p = jnp.take(nodes_bfs, order2)
        qn_s = jnp.take(qn, order2)
        pvalid = cls_s < C  # prefix (padding class C sorts last)
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
        # off + qn is NON-DECREASING over the packed order (classes ascend
        # by size), so node-cap overflow is a pure tail drop: prefix
        # validity — which _expand_compact requires — is preserved.
        fits = pvalid & (off + qn_s <= self.NC)
        ncap_dropped = jnp.sum(pvalid).astype(i32) - jnp.sum(fits).astype(i32)
        nvalid_p = fits
        n_real = jnp.sum(nvalid_p).astype(i32)
        off = jnp.where(nvalid_p, off, self.NC)
        nodes_out = jnp.where(nvalid_p, nodes_p, 0).astype(i32)

        # block_slot0[b] = #{slots : off//128 < b} (off non-decreasing)
        nblocks = self.NC // 128
        blk = jnp.minimum(off // 128, nblocks)
        hist = jnp.zeros(nblocks + 1, i32).at[blk].add(
            nvalid_p.astype(i32))
        block_slot0 = jnp.concatenate(
            [jnp.zeros(1, i32), jnp.cumsum(hist)[:-1]])

        # local slot ids (packed order); invalid slots write the sentinel
        # VALUE D into the sentinel ROW N, so local[N] stays D
        local = jnp.full(N + 1, D, i32).at[
            jnp.where(nvalid_p, nodes_out, N)
        ].set(jnp.where(nvalid_p, jnp.arange(D, dtype=i32), D))

        # 5. outer subgraph -----------------------------------------------
        es = jnp.concatenate(es_bufs)
        ed = jnp.concatenate(ed_bufs)
        la = jnp.take(local, jnp.minimum(es, N))
        lb = jnp.take(local, jnp.minimum(ed, N))
        ok = (la < D) & (lb < D) & (la != lb)
        sent = D * D
        keyv = jnp.where(
            ok, jnp.minimum(la, lb) * D + jnp.maximum(la, lb), sent)
        # NOTE (r3): letting the dedup holes flow through the final
        # dst-sort (one fewer sort, but over 2*Etot+D instead of 2U+D
        # elements) measured WORSE: sort cost is only size-flat up to
        # ~128K; the 262K argsort took the sampler 8.4 -> 14.8 ms. The
        # compaction sort stays.
        kuniq, ucnt = sorted_unique(keyv, sent)
        kept = jnp.minimum(ucnt, self.U)
        outer_dropped = (ucnt - kept) * 2  # both directions drop
        ku = kuniq[: self.U]
        uval = jnp.arange(self.U) < kept
        p0 = jnp.where(uval, ku // D, D)
        p1 = jnp.where(uval, ku % D, D)
        slot = jnp.arange(D, dtype=i32)
        loops = jnp.where(slot < n_real, slot, D)
        su = jnp.concatenate([p0, p1, loops])
        sv = jnp.concatenate([p1, p0, loops])
        o3 = jnp.argsort(sv, stable=True)
        sv_s = jnp.take(sv, o3)
        su_s = jnp.where(sv_s < D, jnp.take(su, o3), 0)
        L = int(su.shape[0])
        if L >= self.OE:
            outer_src = su_s[: self.OE].astype(self.idt)
            outer_dst = sv_s[: self.OE].astype(self.idt)
        else:
            outer_src = jnp.pad(su_s, (0, self.OE - L)).astype(self.idt)
            outer_dst = jnp.pad(
                sv_s, (0, self.OE - L), constant_values=D).astype(self.idt)

        # pairs -> local slots; endpoints dropped by any truncation mask out
        pa = jnp.take(local, all_pairs[:, 0])
        pb2 = jnp.take(local, all_pairs[:, 1])
        pv = (pa < D) & (pb2 < D)
        pairs_local = jnp.stack(
            [jnp.where(pv, pa, 0), jnp.where(pv, pb2, 0)],
            axis=1).astype(self.idt)
        mask = pv.astype(jnp.float32)

        stats = {
            "trunc_nodes_dropped": (
                hop_dropped + ecap_dropped + ncap_dropped).astype(i32),
            "trunc_outer_edges_dropped": outer_dropped.astype(i32),
            "trunc_batches": (
                (hop_dropped + ecap_dropped + ncap_dropped + outer_dropped)
                > 0).astype(i32),
            "batches_sampled": jnp.ones((), i32),
        }
        cb = CompactBatch(
            nodes=nodes_out,
            n_real=n_real,
            pack_off=off.astype(i32),
            block_slot0=block_slot0,
            outer_src=outer_src,
            outer_dst=outer_dst,
            outer_weight=None,
            outer_src_perm=None,
            outer_src_sorted=None,
            pairs=pairs_local,
            labels=labels,
            mask=mask,
            drug_budget=D,
            node_cap=self.NC,
            edge_cap=self.EC,
            outer_edge_cap=self.OE,
        )
        return cb, stats
