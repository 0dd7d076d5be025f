"""Checkpoint/resume via orbax (SURVEY.md §5 checkpoint row).

The reference only torch.saves the best model state_dict (no optimizer, no
resume — SURVEY.md §5); here checkpoints carry params + optimizer state +
step counter + the epoch PRNG key so training resumes exactly. Best-by-val-AUC
retention mirrors the reference's best-model selection.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper: save/restore the full training state."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, params: Any, opt_state: Any, extra: dict | None = None):
        state = {"params": params, "opt_state": opt_state, "extra": extra or {}}
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def save_state(self, step: int, state: dict):
        """Save an arbitrary training-state pytree (params, opt_state, best
        params, epoch counter, metrics) — the fit() periodic-checkpoint path."""
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore_state(self, template: dict, step: int | None = None):
        """Restore the latest (or given) full training state; None if empty."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, step: int | None = None, template: Any = None):
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        if template is not None:
            state = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        else:
            state = self._mgr.restore(step)
        return state

    def close(self):
        self._mgr.close()
