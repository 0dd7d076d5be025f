"""Measure TPU gather strategies for the expand hot path (single-scalar sync).

Each timed fn is wrapped so jit returns ONE scalar (sum of first elements),
avoiding the per-leaf D2H sync inflation of profile_expand.py.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

EC = 2326528          # config4 edge cap
NC = 699136           # config4 node cap
SUM_E = 5890496       # config4 total table edges
SUM_N = 2397900


def timed(fn, *args, n=7, name=""):
    jfn = jax.jit(lambda *a: jax.tree.reduce(
        lambda x, y: x + y,
        jax.tree.map(lambda l: jnp.ravel(l)[0].astype(jnp.float32), fn(*a)),
    ))
    out = jfn(*args)
    np.asarray(out)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = jfn(*args)
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) * 1e3
    print(f"{name:34s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    erows = jnp.asarray(rng.integers(0, SUM_E, EC), jnp.int32)
    nrows = jnp.asarray(rng.integers(0, SUM_N, NC), jnp.int32)

    col = jnp.asarray(rng.integers(0, 1 << 20, SUM_E), jnp.int32)
    timed(lambda c, r: jnp.take(c, r, mode="clip"), col, erows,
          name="1D gather ECx1 int32")

    for w in (2, 4, 8):
        tab = jnp.asarray(
            rng.integers(0, 1 << 20, (SUM_E, w)), jnp.int32)
        timed(lambda t, r: jnp.take(t, r, axis=0, mode="clip"), tab, erows,
              name=f"row gather ECx{w} int32")

    feat = jnp.asarray(rng.random((SUM_N, 32)), jnp.float32)
    timed(lambda t, r: jnp.take(t, r, axis=0, mode="clip"), feat, nrows,
          name="feat row gather NCx32 f32")

    # gather via one_hot? no — EC x SUM_E matmul infeasible. Try sort-based:
    # take_along sorted indices then invert (2 sorts) — for reference only.
    def sorted_gather(c, r):
        order = jnp.argsort(r)
        vals = jnp.take(c, jnp.take(r, order), mode="clip")
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(EC, dtype=jnp.int32))
        return jnp.take(vals, inv, mode="clip")

    timed(sorted_gather, col, erows, name="sorted 1D gather (2 sorts)")

    # contiguous-run structure: real erows are ~60-edge contiguous runs.
    base = rng.integers(0, SUM_E - 256, EC // 64)
    runs = (base[:, None] + np.arange(64)[None, :]).reshape(-1)
    erows_runs = jnp.asarray(runs, jnp.int32)
    timed(lambda c, r: jnp.take(c, r, mode="clip"), col, erows_runs,
          name="1D gather ECx1 (64-runs)")
    tab8 = jnp.asarray(rng.integers(0, 1 << 20, (SUM_E, 8)), jnp.int32)
    timed(lambda t, r: jnp.take(t, r, axis=0, mode="clip"), tab8, erows_runs,
          name="row gather ECx8 (64-runs)")

    # reshaped-run gather: gather 64-row superblocks as single rows
    tabw = jnp.asarray(
        rng.integers(0, 1 << 20, (SUM_E // 64, 64 * 8)), jnp.int32)
    srows = jnp.asarray(base // 64, jnp.int32)
    timed(lambda t, r: jnp.take(t, r, axis=0, mode="clip"), tabw, srows,
          name="superrow gather (EC/64)x512")


if __name__ == "__main__":
    main()
