"""Link-prediction metrics: ROC-AUC and Average Precision (SURVEY.md §2.1 R7).

The reference computes sklearn ``roc_auc_score`` / ``average_precision_score``
on host (SURVEY.md §3.3). Here both metrics exist twice:

  * NumPy host versions (exact, tie-aware AUC) — used by the eval loop on
    small/medium datasets; cross-checked against sklearn in tests.
  * jnp device versions (sort-based, jit-able, mask-aware) — used at scale so
    scores never funnel through the host (SURVEY.md §7 hard parts: "AUC/AP at
    scale").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Host (NumPy) versions
# ---------------------------------------------------------------------------


def _average_ranks(scores: np.ndarray) -> np.ndarray:
    """1-based ranks with ties given the average rank (Mann-Whitney)."""
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(len(scores), np.float64)
    sorted_scores = scores[order]
    i = 0
    while i < len(scores):
        j = i
        while j + 1 < len(scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i : j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    return ranks


def roc_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """Exact tie-aware ROC-AUC via the rank-sum statistic."""
    labels = np.asarray(labels).astype(bool)
    scores = np.asarray(scores, np.float64)
    n_pos = int(labels.sum())
    n_neg = len(labels) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    ranks = _average_ranks(scores)
    return float((ranks[labels].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def average_precision(labels: np.ndarray, scores: np.ndarray) -> float:
    """Average precision (area under the PR curve, step interpolation) —
    matches sklearn.average_precision_score for untied scores."""
    labels = np.asarray(labels).astype(np.float64)
    scores = np.asarray(scores, np.float64)
    n_pos = labels.sum()
    if n_pos == 0:
        return float("nan")
    order = np.argsort(-scores, kind="mergesort")
    tp = np.cumsum(labels[order])
    precision = tp / np.arange(1, len(labels) + 1)
    return float(np.sum(precision * labels[order]) / n_pos)


# ---------------------------------------------------------------------------
# Device (jnp) versions — jit-able, mask-aware
# ---------------------------------------------------------------------------


def roc_auc_jnp(labels: jax.Array, scores: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Exact tie-aware rank-sum AUC on device (matches host ``roc_auc``).

    Ties receive the Mann-Whitney average rank, computed as
    (searchsorted_left + searchsorted_right + 1) / 2 against the sorted
    scores — O(n log n), jit-friendly, no scatter. Masked entries are pushed
    to -inf so they occupy the lowest rank block; subtracting the masked
    count re-bases valid ranks to the valid subset (ties among masked -inf
    entries never interact with valid scores, which are strictly greater)."""
    scores = scores.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones_like(labels)
    mask = mask.astype(jnp.float32)
    neg_inf = jnp.finfo(jnp.float32).min
    eff_scores = jnp.where(mask > 0, scores, neg_inf)
    s = jnp.sort(eff_scores)
    lo = jnp.searchsorted(s, eff_scores, side="left").astype(jnp.float32)
    hi = jnp.searchsorted(s, eff_scores, side="right").astype(jnp.float32)
    ranks = 0.5 * (lo + hi + 1.0)  # 1-based average rank, tie-aware
    n_masked_out = jnp.sum(1.0 - mask)
    ranks = ranks - n_masked_out  # ranks within the valid subset
    n_pos = jnp.sum(labels * mask)
    n_valid = jnp.sum(mask)
    n_neg = n_valid - n_pos
    pos_rank_sum = jnp.sum(ranks * labels * mask)
    return (pos_rank_sum - n_pos * (n_pos + 1) / 2) / jnp.maximum(n_pos * n_neg, 1.0)


def average_precision_jnp(
    labels: jax.Array, scores: jax.Array, mask: jax.Array | None = None
) -> jax.Array:
    scores = scores.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones_like(labels)
    mask = mask.astype(jnp.float32)
    neg_inf = jnp.finfo(jnp.float32).min
    eff = jnp.where(mask > 0, scores, neg_inf)
    order = jnp.argsort(-eff)
    l_sorted = (labels * mask)[order]
    m_sorted = mask[order]
    tp = jnp.cumsum(l_sorted)
    seen = jnp.cumsum(m_sorted)
    precision = tp / jnp.maximum(seen, 1.0)
    n_pos = jnp.sum(labels * mask)
    return jnp.sum(precision * l_sorted) / jnp.maximum(n_pos, 1.0)
