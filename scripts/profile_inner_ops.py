"""Micro-timings of the ops inside the config-#4 inner stage at batch scale.

Measurement method: each op is repeated k times INSIDE one jit (chained so
XLA cannot CSE/DCE), timed with D2H-forced sync, and differenced against the
k=1 run — this cancels the ~25ms fixed dispatch+D2H overhead of the axon
tunnel that polluted naive per-call timings.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

K = 8


def timeit(fn, *args, n=5):
    out = fn(*args)
    np.asarray(jnp.ravel(out)[0])
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jnp.ravel(out)[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench(make_chain, name, *args):
    # arrays are passed as jit ARGUMENTS: closure constants get embedded in
    # the HLO and the axon remote-compile endpoint rejects >MB bodies (413)
    t1 = timeit(jax.jit(make_chain(1)), *args)
    tk = timeit(jax.jit(make_chain(K)), *args)
    per = (tk - t1) / (K - 1) * 1000
    print(f"{name:26s} {per:9.2f} ms/op   (1x={t1*1e3:.1f}ms {K}x={tk*1e3:.1f}ms)",
          flush=True)


def main():
    from bignn_tpu.ops.pallas.segment import segment_sum_pallas

    NC, EC, F, D = 655360, 2326528, 128, 16384
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(NC, F)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, NC, EC).astype(np.int32))
    dst = jnp.asarray(np.sort(rng.integers(0, NC, EC)).astype(np.int32))
    gid = jnp.asarray(np.sort(rng.integers(0, D, NC)).astype(np.int32))
    w1 = jnp.asarray(rng.normal(size=(F, F)).astype(np.float32) * 0.1)
    msgs = jnp.take(x, src, axis=0)

    def gather_chain(k):
        def f(x, src):
            acc = jnp.zeros((EC, F), jnp.float32)
            for i in range(k):
                acc = acc + jnp.take(x + jnp.float32(i), src, axis=0, mode="clip")
            return acc
        return f

    def segsum_chain(k):
        def f(msgs, dst):
            acc = jnp.zeros((NC, F), jnp.float32)
            for i in range(k):
                acc = acc + segment_sum_pallas(msgs + jnp.float32(i), dst, NC)
            return acc
        return f

    def mlp_chain(k):
        def f(x, w1):
            y = x
            for _ in range(k):
                y = jnp.maximum(y @ w1, 0.0)
            return y
        return f

    def readout_chain(k):
        def f(x, gid):
            acc = jnp.zeros((D, F), jnp.float32)
            for i in range(k):
                acc = acc + segment_sum_pallas(x + jnp.float32(i), gid, D)
            return acc
        return f

    def cumsum_chain(k):
        def f(ones):
            acc = jnp.zeros((EC,), jnp.int32)
            for i in range(k):
                acc = acc + jnp.cumsum(ones * (i + 1))
            return acc
        return f

    bench(gather_chain, f"gather {EC}x{F}", x, src)
    bench(segsum_chain, f"segsum {EC}x{F}", msgs, dst)
    bench(mlp_chain, f"matmul {NC}x{F}x{F}", x, w1)
    bench(readout_chain, f"readout {NC}x{F}", x, gid)
    bench(cumsum_chain, f"cumsum {EC}", jnp.ones((EC,), jnp.int32))


if __name__ == "__main__":
    main()
