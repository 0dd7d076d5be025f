"""Does int8 storage of the block-diagonal adjacency pay? Times the
block_diag_spmm batched dot with bf16 vs int8 A-operand at config-#4 shapes
(nblk=3906, F=128) — if XLA fuses the int8->bf16 convert into the dot's
operand stream, A's HBM traffic halves; if it materializes the converted
array, nothing is saved.

Run on the TPU: python scripts/probe_int8_adj.py
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.profile_roofline import timed_carry


def main():
    nblk, F = 3906, 128
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(
        rng.integers(0, 3, (nblk, 128, 128)), jnp.int8)
    a16 = a8.astype(jnp.bfloat16)
    x0 = jnp.asarray(rng.normal(size=(nblk * 128, F)), jnp.bfloat16)

    def spmm(adj, x):
        y = jax.lax.dot_general(
            adj.astype(x.dtype), x.reshape(nblk, 128, F),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return (y.reshape(nblk * 128, F) * jnp.bfloat16(0.5)
                ).astype(jnp.bfloat16)

    t16 = timed_carry(lambda x, a: spmm(a, x), x0, a16, n=64)
    print(f"bf16 adj pass: {t16*1e3:.3f} ms", flush=True)
    t8 = timed_carry(lambda x, a: spmm(a, x), x0, a8, n=64)
    print(f"int8 adj pass: {t8*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
