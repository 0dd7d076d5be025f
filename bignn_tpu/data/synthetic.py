"""Synthetic graph-of-graphs generators (BASELINE.json:7,10).

Two uses:
  * config #1 — a small (~500-drug) CPU-runnable DDI set for the end-to-end
    convergence test (SURVEY.md §4 item 3);
  * config #4 — a large synthetic set (100K subgraphs, 10M outer edges) for
    throughput benchmarking.

The generator plants a *learnable* signal so convergence tests are meaningful:
each drug gets a latent vector z; DDI edges are sampled with probability
sigmoid(z_u . z_v), and each molecule's atom-type distribution is tilted by
its drug's z — an inner GNN that pools atom counts can recover z, and the
outer level + scorer can then separate positives from random negatives.
"""

from __future__ import annotations

import numpy as np

from bignn_tpu.data.schema import DDIDataset, random_split
from bignn_tpu.sparse.formats import COOGraph


def _random_molecule(
    rng: np.random.Generator,
    z: np.ndarray,
    feat_dim: int,
    min_atoms: int,
    max_atoms: int,
    extra_edge_frac: float = 0.3,
) -> COOGraph:
    """Random connected graph (spanning tree + extra edges) with atom types
    sampled from a z-tilted categorical distribution."""
    n = int(rng.integers(min_atoms, max_atoms + 1))
    # spanning tree: node i>0 attaches to a random earlier node
    parents = np.array([rng.integers(0, i) for i in range(1, n)], np.int64)
    src = np.arange(1, n, dtype=np.int64)
    dst = parents
    n_extra = int(n * extra_edge_frac)
    if n_extra > 0 and n > 2:
        es = rng.integers(0, n, n_extra)
        ed = rng.integers(0, n, n_extra)
        keep = es != ed
        src = np.concatenate([src, es[keep]])
        dst = np.concatenate([dst, ed[keep]])
    # both directions
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])

    # atom types tilted by z: logits = W z, W fixed per-process by seeding
    k = z.shape[0]
    w = _type_projection(feat_dim, k)
    logits = w @ z
    p = np.exp(logits - logits.max())
    p /= p.sum()
    types = rng.choice(feat_dim, size=n, p=p)
    feat = np.zeros((n, feat_dim), np.float32)
    feat[np.arange(n), types] = 1.0
    return COOGraph(node_feat=feat, src=s, dst=d)


_TYPE_PROJ_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _type_projection(feat_dim: int, k: int) -> np.ndarray:
    key = (feat_dim, k)
    if key not in _TYPE_PROJ_CACHE:
        rng = np.random.default_rng(12345)
        _TYPE_PROJ_CACHE[key] = rng.normal(size=(feat_dim, k)).astype(np.float64) * 2.0
    return _TYPE_PROJ_CACHE[key]


def make_synthetic_ddi(
    num_drugs: int = 500,
    feat_dim: int = 16,
    latent_dim: int = 4,
    avg_degree: float = 8.0,
    min_atoms: int = 6,
    max_atoms: int = 24,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
    seed: int = 0,
    name: str = "synthetic",
) -> DDIDataset:
    """Generate a planted-signal DDI dataset.

    Edge sampling: scores s_uv = z_u . z_v + bias are computed for random
    candidate pairs; the top ones are kept so the expected degree matches
    ``avg_degree``. This keeps generation O(candidates) instead of O(N^2)
    (needed for the 100K-drug config #4).
    """
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(num_drugs, latent_dim)) / np.sqrt(latent_dim)

    target_edges = int(num_drugs * avg_degree / 2)
    # oversample candidate pairs, keep highest-scoring ones
    n_cand = min(target_edges * 8, num_drugs * (num_drugs - 1) // 2)
    cu = rng.integers(0, num_drugs, n_cand * 2)
    cv = rng.integers(0, num_drugs, n_cand * 2)
    keep = cu < cv
    cu, cv = cu[keep][:n_cand], cv[keep][:n_cand]
    # dedupe
    pair_key = cu.astype(np.int64) * num_drugs + cv
    _, uniq_idx = np.unique(pair_key, return_index=True)
    cu, cv = cu[uniq_idx], cv[uniq_idx]
    scores = np.sum(z[cu] * z[cv], axis=1) + 0.1 * rng.normal(size=cu.shape[0])
    order = np.argsort(-scores)[:target_edges]
    edges = np.stack([cu[order], cv[order]], axis=1).astype(np.int64)

    molecules = [
        _random_molecule(rng, z[i], feat_dim, min_atoms, max_atoms)
        for i in range(num_drugs)
    ]
    train_idx, val_idx, test_idx = random_split(edges.shape[0], val_frac, test_frac, seed)
    return DDIDataset(
        name=name,
        molecules=molecules,
        edges=edges,
        train_idx=train_idx,
        val_idx=val_idx,
        test_idx=test_idx,
    )
