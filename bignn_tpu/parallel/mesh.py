"""Device mesh construction (SURVEY.md T6; conventions from SNIPPETS.md:160-200).

Single entry point so every component agrees on axis names:
  * ``dp``    — data parallel over edge minibatches (P1).
  * ``graph`` — outer-graph edge partition axis (P2); on multi-host slices
                this axis should span hosts so halo all-to-all rides ICI
                within a host group and DCN across (hybrid mesh).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    dp: int | None = None,
    graph: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a ('dp', 'graph') mesh. Defaults: all devices on 'dp'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // graph
    if dp * graph != n:
        raise ValueError(f"dp({dp}) * graph({graph}) != device count ({n})")
    arr = np.asarray(devices).reshape(dp, graph)
    return Mesh(arr, axis_names=("dp", "graph"))
