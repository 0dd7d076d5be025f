"""Micro-benchmarks of the XLA sparse-op path on the real TPU chip.

Informs the Pallas kernel designs (SURVEY.md §7 step 3): where is the XLA
path vs HBM speed-of-light for SpMM-like ops at bench scale?
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices())
dev = jax.devices()[0]


def timeit(f, *args, n=10):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def bench_spmm(N, E, F, dtype=jnp.float32):
    rng = np.random.default_rng(0)
    dst = np.sort(rng.integers(0, N, E)).astype(np.int32)
    src = rng.integers(0, N, E).astype(np.int32)
    w = rng.random(E).astype(np.float32)
    x = rng.random((N, F)).astype(dtype)
    xd, srcd, dstd, wd = map(jax.device_put, (x, src, dst, w))

    @jax.jit
    def spmm(x, src, dst, w):
        msgs = jnp.take(x, src, axis=0, mode="clip") * w[:, None].astype(x.dtype)
        return jax.ops.segment_sum(msgs, dst, num_segments=N, indices_are_sorted=True)

    @jax.jit
    def gather_only(x, src):
        return jnp.take(x, src, axis=0, mode="clip")

    @jax.jit
    def segsum_only(m, dst):
        return jax.ops.segment_sum(m, dst, num_segments=N, indices_are_sorted=True)

    bytes_min = E * F * x.dtype.itemsize + N * F * x.dtype.itemsize  # read rows + write out
    t = timeit(spmm, xd, srcd, dstd, wd)
    tg = timeit(gather_only, xd, srcd)
    msgs = gather_only(xd, srcd)
    ts = timeit(segsum_only, msgs, dstd)
    print(f"N={N} E={E} F={F} {x.dtype.name}: spmm {t*1e3:.2f}ms "
          f"({bytes_min/t/1e9:.0f} GB/s eff) gather {tg*1e3:.2f}ms segsum {ts*1e3:.2f}ms")


for (N, E, F) in [(2_000, 400_000, 64), (100_000, 10_000_000, 64),
                  (100_000, 10_000_000, 128), (50_000, 120_000, 64)]:
    bench_spmm(N, E, F)
bench_spmm(100_000, 10_000_000, 128, jnp.bfloat16)

# unsorted-scatter comparison: how much does the sorted hint matter?
def bench_unsorted(N, E, F):
    rng = np.random.default_rng(0)
    dst = rng.integers(0, N, E).astype(np.int32)  # NOT sorted
    m = rng.random((E, F)).astype(np.float32)
    md, dd = jax.device_put(m), jax.device_put(dst)

    @jax.jit
    def seg(m, dst):
        return jax.ops.segment_sum(m, dst, num_segments=N)

    print(f"unsorted segsum N={N} E={E} F={F}: {timeit(seg, md, dd)*1e3:.2f}ms")

bench_unsorted(100_000, 10_000_000, 64)
