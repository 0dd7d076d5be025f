"""Re-tune build_block_adj (program_rows x block_edges) at the r5
device-calibrated node cap (NC 448512; the r4 tuning session ran at
476928). The adjacency build is the biggest single item inside the
expand stage (3.2 ms of 6.4 — docs/ROOFLINE_r5.txt).

MEASURED (r5, this chip): the landscape is FLAT — every (pr, be) in
{128..1024} x {512..2048} lands at 1.41-1.67 ms on the uniform synthetic
edge distribution (the in-step 3.2 ms includes the real clustered
multiplicities and surrounding masking). The r4 choice pr=256/be=1024
stands; no retune needed at the new cap.

Run on the TPU: python scripts/probe_adj_tuning.py
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from bignn_tpu.ops.pallas.block_adj import build_block_adj


def main():
    NC, EC = 448512, 1659904
    rng = np.random.default_rng(0)
    # config-#4-like block-local edges: dst sorted, src in dst's block
    dst = np.sort(rng.integers(0, NC, EC)).astype(np.int32)
    src = ((dst // 128) * 128 + rng.integers(0, 128, EC)).astype(np.int32)
    bounds = np.arange(0, NC + 1, 128)
    estarts = np.searchsorted(dst, bounds).astype(np.int32)
    srcs, dsts, starts = map(jnp.asarray, (src, dst, estarts))

    def timed(pr, be, reps=3, n=16):
        # scan-amortized with a data dependency; only a scalar crosses
        # the tunnel (fetching the [nblk,128,128] output costs ~0.8 s of
        # pure D2H and swamps the kernel)
        @jax.jit
        def run(s, d, st):
            def body(c, _):
                a = build_block_adj(s + c, d, None, st, NC, jnp.int8,
                                    block_edges=be, program_rows=pr)
                return jnp.max(a).astype(jnp.int32) * 0, None
            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=n)
            return c

        int(run(srcs, dsts, starts))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            int(run(srcs, dsts, starts))
            ts.append((time.perf_counter() - t0) / n)
        return min(ts)

    for pr in (128, 256, 512, 1024):
        for be in (512, 1024, 2048):
            try:
                t = timed(pr, be)
                print(f"pr={pr:5d} be={be:5d}: {t*1e3:7.2f} ms", flush=True)
            except Exception as e:
                print(f"pr={pr:5d} be={be:5d}: FAIL {type(e).__name__}",
                      flush=True)


if __name__ == "__main__":
    main()
