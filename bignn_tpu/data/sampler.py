"""Negative sampling + edge minibatching (SURVEY.md T4/T5; reference §3.1).

The reference samples negatives per iteration by corrupting one endpoint of
each positive edge with uniform random drugs (SURVEY.md §3.1 "sample
negatives"). Here that is a pure PRNG-keyed jnp function so it runs inside the
jit'd train step, is reproducible across device counts (SURVEY.md §4 item 6),
and shards trivially under data parallelism.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sample_negative_pairs(
    key: jax.Array,
    pos_pairs: jax.Array,  # [P, 2] int32
    num_nodes: int,
    ratio: int = 1,
) -> jax.Array:
    """Corrupt one endpoint of each positive edge; returns [P*ratio, 2].

    For each negative, a fair coin picks which endpoint to corrupt and a
    uniform drug replaces it. Collisions with true positives are not filtered
    (standard practice; their measure is tiny and the reference does the same
    uniform corruption).
    """
    p = pos_pairs.shape[0]
    rep = jnp.tile(pos_pairs, (ratio, 1))
    k1, k2 = jax.random.split(key)
    corrupt_right = jax.random.bernoulli(k1, 0.5, (p * ratio,))
    rand_nodes = jax.random.randint(k2, (p * ratio,), 0, num_nodes, dtype=rep.dtype)
    left = jnp.where(corrupt_right, rep[:, 0], rand_nodes)
    right = jnp.where(corrupt_right, rand_nodes, rep[:, 1])
    return jnp.stack([left, right], axis=1)


def make_training_pairs(
    key: jax.Array,
    pos_pairs: jax.Array,
    num_nodes: int,
    neg_ratio: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """Positives + sampled negatives with 1/0 labels: ([P*(1+r), 2], labels)."""
    neg = sample_negative_pairs(key, pos_pairs, num_nodes, neg_ratio)
    pairs = jnp.concatenate([pos_pairs, neg], axis=0)
    labels = jnp.concatenate(
        [jnp.ones(pos_pairs.shape[0]), jnp.zeros(neg.shape[0])]
    ).astype(jnp.float32)
    return pairs, labels


class EdgeMinibatchSampler:
    """Host-side epoch iterator over positive edges, static batch size.

    Yields ``(pairs [B, 2] int32, mask [B] f32)``; the last batch is padded
    (mask 0) so every step compiles to the same shape. This is the outer half
    of the reference's hierarchical mini-batch (SURVEY.md §2.1 R6); on small
    datasets the inner level runs all molecules every step, while large
    configs subset via data/neighbor sampling.
    """

    def __init__(self, pos_pairs: np.ndarray, batch_size: int, seed: int = 0):
        self.pos = np.asarray(pos_pairs, np.int32)
        self.batch_size = int(batch_size)
        self.seed = int(seed)
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return -(-self.pos.shape[0] // self.batch_size)

    def epoch(self, epoch_idx: int | None = None):
        """``epoch_idx`` makes the epoch's shuffle a pure function of
        (seed, epoch_idx) — required for exact checkpoint-resume (the
        trainer passes it); None keeps the stateful-rng behavior."""
        rng = (np.random.default_rng((self.seed, epoch_idx))
               if epoch_idx is not None else self._rng)
        perm = rng.permutation(self.pos.shape[0])
        for start in range(0, len(perm), self.batch_size):
            idx = perm[start : start + self.batch_size]
            pairs = self.pos[idx]
            n = pairs.shape[0]
            if n < self.batch_size:
                pad = np.zeros((self.batch_size - n, 2), np.int32)
                pairs = np.concatenate([pairs, pad], axis=0)
            mask = np.zeros(self.batch_size, np.float32)
            mask[:n] = 1.0
            yield pairs, mask
