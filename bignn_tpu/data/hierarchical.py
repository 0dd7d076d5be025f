"""Hierarchical mini-batch + neighbor sampling (SURVEY.md T4; configs #3-4).

For datasets where encoding every molecule every step is wasteful (BioSNAP
mini-batching, BASELINE.json:9) or impossible (100K-subgraph synthetic,
BASELINE.json:10), each training step samples:

  1. a minibatch of positive DDI edges + host-sampled negative corruptions;
  2. the L-hop sampled neighborhood of all pair endpoints over the outer
     train graph (per-hop fanout, GraphSAGE-style) — the outer convs run on
     this subgraph only, with GCN weights from **global** degrees so
     minibatch aggregation is an unbiased-scaled version of the full pass;
  3. the molecule graphs of exactly the sampled drugs, packed into one
     padded union with **fixed caps** so the train step compiles once.

All shapes are static: node/edge budgets are caps, shortfall is padding
(dropped via the usual one-past-the-end segment ids), overflow is truncated
by the sampler (never at trace time).
"""

from __future__ import annotations

import dataclasses

import numpy as np
from flax import struct

from bignn_tpu.data.schema import DDIDataset
from bignn_tpu.sparse.formats import COOGraph, _build_sorted


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


@struct.dataclass
class HierarchicalBatch:
    """One step's sampled data; every field has static shape."""

    # molecule union of the sampled drugs (local drug slot = graph id)
    node_feat: np.ndarray  # [node_cap, F]
    edge_src: np.ndarray  # [edge_cap]
    edge_dst: np.ndarray  # [edge_cap] sorted; pad -> node_cap
    edge_weight: np.ndarray  # [edge_cap]
    graph_ids: np.ndarray  # [node_cap]; pad -> drug_budget
    graph_n_nodes: np.ndarray  # [drug_budget]
    # sampled outer subgraph (local drug slots)
    outer_src: np.ndarray  # [outer_edge_cap]
    outer_dst: np.ndarray  # [outer_edge_cap] sorted; pad -> drug_budget
    outer_weight: np.ndarray  # [outer_edge_cap]
    # scoring pairs (local slots) + labels
    pairs: np.ndarray  # [pair_cap, 2]
    labels: np.ndarray  # [pair_cap]
    mask: np.ndarray  # [pair_cap]
    drug_budget: int = struct.field(pytree_node=False)
    node_cap: int = struct.field(pytree_node=False)
    edge_cap: int = struct.field(pytree_node=False)
    outer_edge_cap: int = struct.field(pytree_node=False)


class HierarchicalSampler:
    """Host-side sampler producing fixed-shape HierarchicalBatch records."""

    def __init__(
        self,
        ds: DDIDataset,
        batch_size: int = 256,
        neg_ratio: int = 1,
        fanouts: tuple[int, ...] = (10,),
        seed: int = 0,
    ):
        self.ds = ds
        self.batch_size = batch_size
        self.neg_ratio = neg_ratio
        self.fanouts = tuple(fanouts)
        self._rng = np.random.default_rng(seed)
        self.num_nodes = ds.num_drugs

        train = ds.split_edges("train").astype(np.int64)
        # undirected CSR over train edges (host adjacency for sampling)
        u = np.concatenate([train[:, 0], train[:, 1]])
        v = np.concatenate([train[:, 1], train[:, 0]])
        order = np.argsort(u, kind="stable")
        self._adj_dst = v[order].astype(np.int32)
        self._adj_ptr = np.zeros(self.num_nodes + 1, np.int64)
        np.add.at(self._adj_ptr, u + 1, 1)
        self._adj_ptr = np.cumsum(self._adj_ptr)
        self.train_pairs = train
        # global degrees for GCN weights (self-loops counted, matching
        # formats.gcn_normalize on the full train graph)
        deg = np.bincount(np.concatenate([u, np.arange(self.num_nodes)]),
                          minlength=self.num_nodes).astype(np.float64)
        self._inv_sqrt_deg = (1.0 / np.sqrt(np.maximum(deg, 1.0))).astype(np.float32)

        # ---- static caps -------------------------------------------------
        seeds = batch_size * 2 * (1 + neg_ratio)
        budget = seeds
        frontier = seeds
        tree_edges = 0
        for f in self.fanouts:
            tree_edges += frontier * f
            frontier = frontier * f
            budget += frontier
        self.drug_budget = min(budget, self.num_nodes)
        max_atoms = max(m.num_nodes for m in ds.molecules)
        max_bonds = max(m.num_edges for m in ds.molecules)
        self.node_cap = _round_up(self.drug_budget * max_atoms, 8)
        self.edge_cap = _round_up(self.drug_budget * (max_bonds + max_atoms), 128)
        # sampled tree edges (both directions) + self loops
        self.outer_edge_cap = _round_up(2 * tree_edges + self.drug_budget, 128)

    def __len__(self) -> int:
        return -(-len(self.train_pairs) // self.batch_size)

    # ------------------------------------------------------------------
    def _sample_neighbors(self, seeds: np.ndarray):
        """Per-hop fanout sampling; returns (nodes, edges (global u->v))."""
        nodes = list(dict.fromkeys(seeds.tolist()))
        seen = set(nodes)
        frontier = nodes
        es, ed = [], []
        for fanout in self.fanouts:
            nxt = []
            for nvtx in frontier:
                lo, hi = self._adj_ptr[nvtx], self._adj_ptr[nvtx + 1]
                if hi == lo:
                    continue
                neigh = self._adj_dst[lo:hi]
                if len(neigh) > fanout:
                    neigh = self._rng.choice(neigh, fanout, replace=False)
                for m in neigh:
                    m = int(m)
                    es.append(m); ed.append(nvtx)  # message m -> nvtx
                    if m not in seen:
                        seen.add(m); nxt.append(m); nodes.append(m)
            frontier = nxt
        return np.asarray(nodes, np.int64), np.asarray(es, np.int64), np.asarray(ed, np.int64)

    @property
    def pair_cap(self) -> int:
        return self.batch_size * (1 + self.neg_ratio)

    def sample(self) -> HierarchicalBatch:
        rng = self._rng
        bs = self.batch_size
        idx = rng.choice(len(self.train_pairs), bs, replace=len(self.train_pairs) < bs)
        pos = self.train_pairs[idx]
        # host-sampled negative corruptions (endpoints must join the subgraph)
        negs = []
        for _ in range(self.neg_ratio):
            corrupt_right = rng.random(bs) < 0.5
            rand = rng.integers(0, self.num_nodes, bs)
            nu = np.where(corrupt_right, pos[:, 0], rand)
            nv = np.where(corrupt_right, rand, pos[:, 1])
            negs.append(np.stack([nu, nv], 1))
        all_pairs = np.concatenate([pos] + negs, axis=0)
        labels = np.concatenate(
            [np.ones(bs, np.float32), np.zeros(bs * self.neg_ratio, np.float32)]
        )
        return self.batch_from_pairs(all_pairs, labels)

    def batch_from_pairs(
        self, all_pairs: np.ndarray, labels: np.ndarray
    ) -> HierarchicalBatch:
        """Build a fixed-shape batch around given (global-id) pairs — used by
        the train step (with sampled negatives) and chunked evaluation alike.
        Pads the pair list up to pair_cap with masked slots."""
        p = all_pairs.shape[0]
        if p > self.pair_cap:
            raise ValueError(f"{p} pairs > pair_cap {self.pair_cap}")
        pad_mask = np.zeros(self.pair_cap, np.float32)
        pad_mask[:p] = 1.0
        if p < self.pair_cap:
            all_pairs = np.concatenate(
                [all_pairs, np.zeros((self.pair_cap - p, 2), all_pairs.dtype)]
            )
            labels = np.concatenate([labels, np.zeros(self.pair_cap - p, np.float32)])

        seeds = np.unique(all_pairs.reshape(-1))
        nodes, es, ed = self._sample_neighbors(seeds)
        if len(nodes) > self.drug_budget:  # cap overflow: keep seeds first
            nodes = nodes[: self.drug_budget]
        keep = set(nodes.tolist())
        local = {g: i for i, g in enumerate(nodes)}

        # outer subgraph edges (sampled tree, both directions, + self loops),
        # weights from global degrees. Deduplicate as undirected pairs first:
        # an edge collected from both endpoints' frontiers (or in two hops)
        # must not aggregate twice.
        em = {
            (min(local[a], local[b]), max(local[a], local[b]))
            for a, b in zip(es, ed)
            if a in keep and b in keep and a != b
        }
        su = np.asarray([p[0] for p in em] + [p[1] for p in em]
                        + list(range(len(nodes))), np.int64)
        sv = np.asarray([p[1] for p in em] + [p[0] for p in em]
                        + list(range(len(nodes))), np.int64)
        gw = self._inv_sqrt_deg[nodes]
        w = gw[su] * gw[sv]
        order = np.argsort(sv, kind="stable")
        su, sv, w = su[order], sv[order], w[order].astype(np.float32)
        oe_cap = self.outer_edge_cap
        if len(su) > oe_cap:
            su, sv, w = su[:oe_cap], sv[:oe_cap], w[:oe_cap]

        # molecule union of sampled drugs
        feats, msrc, mdst, gids, nnodes = [], [], [], [], []
        off = 0
        for li, g in enumerate(nodes):
            m: COOGraph = self.ds.molecules[g]
            feats.append(m.node_feat)
            msrc.append(np.asarray(m.src, np.int64) + off)
            mdst.append(np.asarray(m.dst, np.int64) + off)
            gids.append(np.full(m.num_nodes, li, np.int32))
            nnodes.append(m.num_nodes)
            off += m.num_nodes
        ms, md, mw = _build_sorted(
            np.concatenate(msrc), np.concatenate(mdst), off, True, True
        )

        D, NC, EC = self.drug_budget, self.node_cap, self.edge_cap

        def pad(x, cap, fill, dtype=None):
            out = np.full((cap,) + x.shape[1:], fill, dtype or x.dtype)
            out[: len(x)] = x
            return out

        pairs_local = np.asarray(
            [[local.get(int(a), 0), local.get(int(b), 0)] for a, b in all_pairs],
            np.int32,
        )
        # pairs whose endpoint fell off the truncated node list are masked out
        valid = np.asarray(
            [int(a) in keep and int(b) in keep for a, b in all_pairs], np.float32
        )

        return HierarchicalBatch(
            node_feat=pad(np.concatenate(feats).astype(np.float32), NC, 0.0),
            edge_src=pad(ms.astype(np.int32), EC, 0),
            edge_dst=pad(md.astype(np.int32), EC, NC),
            edge_weight=pad(mw, EC, 0.0),
            graph_ids=pad(np.concatenate(gids), NC, D),
            graph_n_nodes=pad(np.asarray(nnodes, np.float32), D, 0.0),
            outer_src=pad(su.astype(np.int32), oe_cap, 0),
            outer_dst=pad(sv.astype(np.int32), oe_cap, D),
            outer_weight=pad(w, oe_cap, 0.0),
            pairs=pairs_local,
            labels=labels,
            mask=valid,
            drug_budget=D,
            node_cap=NC,
            edge_cap=EC,
            outer_edge_cap=oe_cap,
        )
