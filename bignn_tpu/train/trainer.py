"""Training driver (SURVEY.md T5; reference train loop §2.1 R3, §3.1).

One jit'd train step covers: negative sampling (PRNG-keyed, on device),
full bi-level forward, masked BCE loss, grad, optax update. The epoch loop,
eval hooks and best-model selection mirror the reference's driver
(SURVEY.md §3.1) without its host-side hot loops.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bignn_tpu.data.sampler import EdgeMinibatchSampler, sample_negative_pairs
from bignn_tpu.data.schema import DeviceData
from bignn_tpu.models.bignn import BiGNN
from bignn_tpu.models.loss import bce_with_logits_loss
from bignn_tpu.train.metrics import average_precision, roc_auc


@dataclasses.dataclass
class TrainConfig:
    lr: float = 1e-3
    epochs: int = 20
    batch_size: int = 256
    neg_ratio: int = 1
    eval_every: int = 1  # epochs
    seed: int = 0
    weight_decay: float = 0.0


class Trainer:
    """Single-host trainer. Distribution lives in parallel/ (SURVEY.md T6)."""

    def __init__(self, model: BiGNN, data: DeviceData, config: TrainConfig):
        self.model = model
        self.data = data
        self.config = config
        self.optimizer = (
            optax.adamw(config.lr, weight_decay=config.weight_decay)
            if config.weight_decay
            else optax.adam(config.lr)
        )
        # device-resident graph structures (tuples -> stable pytree structure)
        self.buckets = tuple(jax.tree.map(jnp.asarray, b) for b in data.bucketing.batches)
        self.graph_index = tuple(jnp.asarray(i) for i in data.bucketing.graph_index)
        self.outer = jax.tree.map(jnp.asarray, data.outer)
        self._train_step = jax.jit(self._step)
        self._score_pairs = jax.jit(self._score)

    # -- jitted bodies ---------------------------------------------------
    def _loss_fn(self, params, key, pos_pairs, pos_mask):
        neg = sample_negative_pairs(
            key, pos_pairs, self.data.num_drugs, self.config.neg_ratio
        )
        pairs = jnp.concatenate([pos_pairs, neg], axis=0)
        labels = jnp.concatenate(
            [jnp.ones(pos_pairs.shape[0]), jnp.zeros(neg.shape[0])]
        )
        mask = jnp.concatenate([pos_mask, jnp.tile(pos_mask, (self.config.neg_ratio,))])
        logits = self.model.apply(
            params, self.buckets, self.graph_index, self.outer, pairs
        )
        return bce_with_logits_loss(logits, labels, mask)

    def _step(self, params, opt_state, key, pos_pairs, pos_mask):
        loss, grads = jax.value_and_grad(self._loss_fn)(params, key, pos_pairs, pos_mask)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def _score(self, params, pairs):
        return self.model.apply(
            params, self.buckets, self.graph_index, self.outer, pairs
        )

    # -- host loop -------------------------------------------------------
    def init(self, key: jax.Array | None = None):
        key = key if key is not None else jax.random.key(self.config.seed)
        params = self.model.init(key)
        opt_state = self.optimizer.init(params)
        return params, opt_state

    def evaluate(self, params, split: str = "val", neg_seed: int = 1234) -> dict:
        """Score held-out positives + an equal number of sampled negatives;
        host AUC/AP (SURVEY.md §3.3)."""
        pos = {"val": self.data.val_pairs, "test": self.data.test_pairs,
               "train": self.data.train_pairs}[split]
        pos = jnp.asarray(pos)
        key = jax.random.key(neg_seed)
        neg = sample_negative_pairs(key, pos, self.data.num_drugs, 1)
        pairs = jnp.concatenate([pos, neg], axis=0)
        scores = np.asarray(self._score_pairs(params, pairs))
        labels = np.concatenate([np.ones(pos.shape[0]), np.zeros(neg.shape[0])])
        return {
            f"{split}_auc": roc_auc(labels, scores),
            f"{split}_ap": average_precision(labels, scores),
        }

    def fit(
        self,
        params=None,
        opt_state=None,
        log_fn: Callable[[dict], None] | None = None,
    ) -> tuple[Any, dict]:
        """Full training run; returns (best_params, history)."""
        cfg = self.config
        if params is None:
            params, opt_state = self.init()
        sampler = EdgeMinibatchSampler(self.data.train_pairs, cfg.batch_size, cfg.seed)
        key = jax.random.key(cfg.seed + 1)
        best = {"val_auc": -1.0, "params": params, "epoch": -1}
        history = []
        for epoch in range(cfg.epochs):
            t0 = time.perf_counter()
            losses = []
            for pairs, mask in sampler.epoch():
                key, sub = jax.random.split(key)
                params, opt_state, loss = self._train_step(
                    params, opt_state, sub, jnp.asarray(pairs), jnp.asarray(mask)
                )
                losses.append(loss)
            rec = {
                "epoch": epoch,
                "loss": float(jnp.mean(jnp.stack(losses))),
                "epoch_time_s": time.perf_counter() - t0,
            }
            if (epoch + 1) % cfg.eval_every == 0 or epoch == cfg.epochs - 1:
                rec.update(self.evaluate(params, "val"))
                if rec["val_auc"] > best["val_auc"]:
                    best = {"val_auc": rec["val_auc"], "params": params, "epoch": epoch}
            history.append(rec)
            if log_fn:
                log_fn(rec)
        final = self.evaluate(best["params"], "test")
        return best["params"], {"history": history, "best_epoch": best["epoch"], **final}
