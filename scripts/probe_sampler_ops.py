"""Micro-op costs at the device sampler's EXACT config-#4 shapes.

The sampler draw is 4.4 ms scan-amortized; this ranks its primitive ops so
optimization effort lands where the time is. Carry-threaded (cannot be
DCE'd, no scan floor distortion).

Run on the TPU: python scripts/probe_sampler_ops.py
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.profile_roofline import timed_carry


def main(n=16):
    rng = np.random.default_rng(0)
    i32 = jnp.int32
    N, D, C = 100_000, 16_384, 9
    Etot, L, M = 40_960, 59_008, 20_480

    def lcg(x):
        return x * 1664525 + 1013904223

    a41 = jnp.asarray(rng.integers(0, 1 << 30, Etot), i32)
    t = timed_carry(lambda x: jnp.sort(lcg(x)), a41, n=n)
    print(f"sort {Etot}: {t*1e3:.3f} ms", flush=True)

    t = timed_carry(lambda x: jnp.take(jnp.sort(lcg(x)),
                                       jnp.argsort(lcg(x))), a41, n=n)
    print(f"sort+argsort {Etot}: {t*1e3:.3f} ms", flush=True)

    a59 = jnp.asarray(rng.integers(0, 1 << 30, L), i32)
    t = timed_carry(lambda x: jnp.take(x, jnp.argsort(lcg(x))), a59, n=n)
    print(f"argsort+take {L}: {t*1e3:.3f} ms", flush=True)

    # sorted_unique = 2 sorts + mask (hop dedup and outer dedup pattern)
    def su(x):
        xs = jnp.sort(lcg(x) % (1 << 28))
        m = jnp.concatenate([jnp.ones(1, bool), xs[1:] != xs[:-1]])
        return jnp.sort(jnp.where(m, xs, 1 << 29))

    t = timed_carry(su, a41, n=n)
    print(f"sorted_unique {Etot}: {t*1e3:.3f} ms", flush=True)

    # bitmap-dedup alternative pieces
    t = timed_carry(
        lambda x: lcg(jnp.cumsum(x)), jnp.ones(N, i32), n=n)
    print(f"cumsum {N}: {t*1e3:.3f} ms", flush=True)

    idx41 = jnp.asarray(rng.integers(0, N, Etot), i32)
    t = timed_carry(
        lambda x, ix: x.at[ix].set(True),
        jnp.zeros(N + 1, bool), idx41, n=n)
    print(f"scatter-set {Etot}->[{N}] bool: {t*1e3:.3f} ms", flush=True)

    posN = jnp.asarray(rng.integers(0, D, N), i32)
    t = timed_carry(
        lambda x, p: x.at[:D].add(
            jnp.zeros(D, i32).at[p].set(x, mode='drop')),
        jnp.arange(N, dtype=i32), posN, n=n)
    print(f"scatter {N}->[{D}]: {t*1e3:.3f} ms", flush=True)

    # class packing: one-hot cumsum [M, C]
    cls = jnp.asarray(rng.integers(0, C, M), i32)
    t = timed_carry(
        lambda x: (jnp.cumsum(
            ((x[:, None] % C) == jnp.arange(C)[None, :]).astype(i32),
            axis=0)[:, 0] + x),
        cls, n=n)
    print(f"one-hot cumsum [{M},{C}]: {t*1e3:.3f} ms", flush=True)

    # adjacency fanout gather [4096, 10] + RNG
    adj = jnp.asarray(rng.integers(0, N, 2 * 8_000_000), i32)
    fidx = jnp.asarray(rng.integers(0, 2 * 8_000_000 - 16, 4096), i32)
    t = timed_carry(
        lambda ix, a: (jnp.take(a, (ix[:, None] + jnp.arange(10)[None, :])
                                .reshape(-1)).reshape(4096, 10).sum(1)
                       % (2 * 8_000_000 - 16)).astype(i32),
        fidx, adj, n=n)
    print(f"fanout gather [4096,10] from 16M: {t*1e3:.3f} ms", flush=True)

    # PRNG: uniform [4096, 10] + randint
    key = jax.random.key(0)
    t = timed_carry(
        lambda x: (jax.random.uniform(
            jax.random.fold_in(key, x[0]), (4096, 10)) * 100).astype(i32)
        + x,
        jnp.zeros((4096, 10), i32), n=n)
    print(f"uniform [4096,10]: {t*1e3:.3f} ms", flush=True)

    # 3 scatters over [M]->[D] (class packing outputs)
    posM = jnp.asarray(rng.integers(0, D, M), i32)
    t = timed_carry(
        lambda x, p: x.at[:D].add(
            jnp.zeros(D, i32).at[p].set(x[:M], mode='drop')),
        jnp.arange(M, dtype=i32), posM, n=n)
    print(f"scatter {M}->[{D}]: {t*1e3:.3f} ms", flush=True)

    # gather local[es] (outer localization) [Etot] from [N]
    loc = jnp.asarray(rng.integers(0, D, N + 1), i32)
    t = timed_carry(
        lambda ix, lo: (jnp.take(lo, ix) + ix) % N, idx41, loc, n=n)
    print(f"gather {Etot} from [{N}]: {t*1e3:.3f} ms", flush=True)


def probe_cumsum(n=16):
    import jax, jax.numpy as jnp, numpy as np
    from scripts.profile_roofline import timed_carry
    i32 = jnp.int32
    M, C = 20_480, 9
    x0 = jnp.ones(M, i32)

    def lcg(x):
        return x * 1664525 + 1013904223

    t = timed_carry(lambda x: lcg(jnp.cumsum(x % 7)), x0, n=n)
    print(f"cumsum {M}: {t*1e3:.3f} ms", flush=True)

    t = timed_carry(
        lambda x: lcg(jnp.cumsum(
            ((x[:, None] % C) == jnp.arange(C)[None, :]).astype(i32),
            axis=0)[:, 0]),
        x0, n=n)
    print(f"one-hot cumsum [{M},{C}]: {t*1e3:.3f} ms", flush=True)

    # MXU-based segmented cumsum: [R,128] chunks, in-chunk via triu matmul
    R = M // 128
    tri = jnp.asarray(np.triu(np.ones((128, 128), np.float32)))

    def fast_cumsum(v):  # [M] int32
        xf = v.reshape(R, 128).astype(jnp.float32)
        within = jax.lax.dot_general(
            xf, tri, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [R,128] inclusive
        offs = jnp.cumsum(within[:, -1]) - within[:, -1]  # [R]
        return (within + offs[:, None]).reshape(M).astype(i32)

    t = timed_carry(lambda x: lcg(fast_cumsum(x % 7)), x0, n=n)
    print(f"MXU cumsum {M}: {t*1e3:.3f} ms", flush=True)

    def fast_cumsum2d(oh):  # [M, C] int32
        xf = oh.reshape(R, 128, C).astype(jnp.float32)
        within = jax.lax.dot_general(
            tri, xf, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [128(j), R, C]? check dims
        within = jnp.moveaxis(within, 0, 1)  # [R, 128, C]
        offs = jnp.cumsum(within[:, -1, :], axis=0) - within[:, -1, :]
        return (within + offs[:, None, :]).reshape(M, C).astype(i32)

    t = timed_carry(
        lambda x: lcg(fast_cumsum2d(
            ((x[:, None] % C) == jnp.arange(C)[None, :]).astype(i32))[:, 0]),
        x0, n=n)
    print(f"MXU one-hot cumsum [{M},{C}]: {t*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    if len(_sys.argv) > 1 and _sys.argv[1] == "cumsum":
        probe_cumsum(int(_sys.argv[2]) if len(_sys.argv) > 2 else 16)
    else:
        main(int(_sys.argv[1]) if len(_sys.argv) > 1 else 16)
