"""Link-prediction loss (SURVEY.md §2.1 R5 loss layer).

BCE-with-logits over positive edges and sampled negatives, numerically stable
(log-sum-exp form), with optional per-example mask for padded pair slots.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits_elementwise(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-example BCE terms — exposed separately so distributed steps can
    psum the (sum, count) pair across shards for an exact global masked mean
    (parallel/step.py, MinibatchTrainer's dp path)."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    # max(x,0) - x*y + log(1 + exp(-|x|))
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def bce_with_logits_loss(
    logits: jax.Array,
    labels: jax.Array,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Mean binary cross-entropy; ``labels`` in {0, 1}, optional 0/1 mask."""
    per = bce_with_logits_elementwise(logits, labels)
    if mask is not None:
        mask = mask.astype(jnp.float32)
        return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(per)
