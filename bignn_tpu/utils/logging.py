"""Metric logging (SURVEY.md §5 metrics row).

Replaces the reference's TensorBoardX scalars with a dependency-free JSONL
writer (one record per eval/epoch) + stdout mirror; the JSONL is trivially
loadable into pandas/tensorboard later.
"""

from __future__ import annotations

import json
import os
import time


class MetricLogger:
    def __init__(self, run_dir: str | None = None, stdout: bool = True):
        self.stdout = stdout
        self._fh = None
        if run_dir:
            os.makedirs(run_dir, exist_ok=True)
            self._fh = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self._t0 = time.time()

    def log(self, record: dict) -> None:
        record = {"wall_s": round(time.time() - self._t0, 3), **record}
        if self._fh:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()
        if self.stdout:
            parts = [
                f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in record.items()
            ]
            print(" ".join(parts), flush=True)

    def __call__(self, record: dict) -> None:
        self.log(record)

    def close(self):
        if self._fh:
            self._fh.close()
