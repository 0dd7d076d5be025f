"""Probe which in-kernel gather strategies Mosaic/TPU supports (jax 0.9)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, E, F = 512, 256, 128
rng = np.random.default_rng(0)
x = rng.random((N, F)).astype(np.float32)
idx = rng.integers(0, N, E).astype(np.int32)
expect = x[idx]


def try_kernel(name, fn):
    try:
        out = fn()
        ok = np.allclose(np.asarray(out), expect, atol=1e-5)
        print(f"{name}: ran, correct={ok}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAILED ({type(e).__name__}: {msg})")


# 1. vectorized fancy indexing on the ref
def k1(x_ref, i_ref, o_ref):
    o_ref[:] = x_ref[i_ref[:], :]

try_kernel("fancy-index-ref", lambda: pl.pallas_call(
    k1, out_shape=jax.ShapeDtypeStruct((E, F), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, idx))


# 2. jnp.take on loaded value
def k2(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=0)

try_kernel("jnp-take-loaded", lambda: pl.pallas_call(
    k2, out_shape=jax.ShapeDtypeStruct((E, F), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, idx))


# 3. per-edge fori_loop with dynamic row read (idx in SMEM)
def k3(i_ref, x_ref, o_ref):
    def body(e, _):
        s = i_ref[e]
        o_ref[pl.ds(e, 1), :] = x_ref[pl.ds(s, 1), :]
        return 0
    jax.lax.fori_loop(0, E, body, 0)

try_kernel("fori-smem-rowcopy", lambda: pl.pallas_call(
    k3, out_shape=jax.ShapeDtypeStruct((E, F), jnp.float32),
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))(idx, x))


# 4. one-hot matmul gather (MXU)
def k4(x_ref, i_ref, o_ref):
    ids = jax.lax.broadcasted_iota(jnp.int32, (E, N), 1)
    onehot = (ids == i_ref[:].reshape(E, 1)).astype(jnp.float32)
    o_ref[:] = jnp.dot(onehot, x_ref[:], preferred_element_type=jnp.float32)

try_kernel("onehot-mxu", lambda: pl.pallas_call(
    k4, out_shape=jax.ShapeDtypeStruct((E, F), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, idx))


# 5. jax.lax.gather HLO-style
def k5(x_ref, i_ref, o_ref):
    o_ref[:] = x_ref[:][i_ref[:]]

try_kernel("getitem-loaded", lambda: pl.pallas_call(
    k5, out_shape=jax.ShapeDtypeStruct((E, F), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, idx))

print("done")
