"""Is scatter(D deltas)+cumsum(EC) cheaper than a [EC,3] row gather?"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

EC, D = 1393280, 16384

def timed(fn, *args, n=7, name=""):
    jfn = jax.jit(lambda *a: jax.tree.reduce(
        lambda x, y: x + y,
        jax.tree.map(lambda l: jnp.ravel(l)[0].astype(jnp.float32), fn(*a))))
    np.asarray(jfn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); np.asarray(jfn(*args)); ts.append(time.perf_counter()-t0)
    print(f"{name:34s} {float(np.median(ts))*1e3:9.2f} ms", flush=True)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 100, EC), jnp.int32)
timed(lambda v: jnp.cumsum(v), x, name="cumsum EC i32")
starts = jnp.asarray(np.sort(rng.choice(EC, D, replace=False)), jnp.int32)
deltas = jnp.asarray(rng.integers(-50, 50, D), jnp.int32)
def expand(st, dl):
    z = jnp.zeros(EC, jnp.int32).at[st].add(dl, mode="drop")
    return jnp.cumsum(z)
timed(expand, starts, deltas, name="scatter D + cumsum EC")
def expand3(st, d1, d2, d3):
    z = jnp.zeros((EC, 4), jnp.int32).at[st].add(
        jnp.stack([d1, d2, d3, d3], 1), mode="drop")
    return jnp.cumsum(z, axis=0)
timed(expand3, starts, deltas, deltas, deltas, name="3-field scatter+cumsum (packed4)")
def expand3s(st, d1, d2, d3):
    return tuple(jnp.cumsum(jnp.zeros(EC, jnp.int32).at[st].add(d, mode="drop"))
                 for d in (d1, d2, d3))
timed(expand3s, starts, deltas, deltas, deltas, name="3x separate scatter+cumsum")
tbl = jnp.asarray(rng.integers(0, 1000, (D + 1, 3)), jnp.int32)
slot = jnp.asarray(np.sort(rng.integers(0, D, EC)), jnp.int32)
timed(lambda t, s: jnp.take(t, s, axis=0, mode="clip"), tbl, slot,
      name="[EC,3] row gather (baseline)")
