"""Time flash-GAT Pallas kernel vs the XLA dense masked-softmax path.

DrugBank outer-graph shapes: N=1704 drugs, H=4 heads, D=16 head dim,
cnt [N, N] edge-multiplicity mask. Times a lax.scan of STEPS applications
to amortize the device-tunnel dispatch cost (~25 ms/call), same approach
as bench.py.

Usage: python scripts/profile_flash_gat.py [N] [H] [D]
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bignn_tpu.models.convs import _dense_masked_softmax_agg
from bignn_tpu.ops.pallas.flash_gat import flash_gat_attention

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1704
H = int(sys.argv[2]) if len(sys.argv) > 2 else 4
D = int(sys.argv[3]) if len(sys.argv) > 3 else 16
STEPS = int(sys.argv[4]) if len(sys.argv) > 4 else 500

key = jax.random.PRNGKey(0)
k1, k2, k3, k4 = jax.random.split(key, 4)
score_l = jax.random.normal(k1, (N, H), jnp.float32)
score_r = jax.random.normal(k2, (N, H), jnp.float32)
v = jax.random.normal(k3, (N, H, D), jnp.bfloat16)
cnt = (jax.random.uniform(k4, (N, N)) < 0.004).astype(jnp.float32)
g = jax.random.normal(key, (N, H, D), jnp.bfloat16)
slope = 0.2


def xla_fwd(sl, sr, vv):
    e = jax.nn.leaky_relu(sl[:, None, :] + sr[None, :, :], slope)
    return _dense_masked_softmax_agg(e, cnt, vv, vv.dtype)


def flash_fwd(sl, sr, vv):
    return flash_gat_attention(sl, sr, vv, cnt, slope, False)


def loss_of(fwd):
    def f(sl, sr, vv):
        return jnp.sum((fwd(sl, sr, vv).astype(jnp.float32)
                        * g.astype(jnp.float32)))
    return f


def scanned(step):
    """fold the step's output back into an input so scan can't elide it"""
    def body(carry, _):
        sl, sr, vv = carry
        out = step(sl, sr, vv)
        if isinstance(out, tuple):  # grads (dsl, dsr, dv)
            sl = sl + 1e-12 * out[0]
            vv = vv + 1e-12 * out[2].astype(vv.dtype)
        else:
            vv = vv + 1e-12 * out.astype(vv.dtype)
        return (sl, sr, vv), ()

    @jax.jit
    def run(sl, sr, vv):
        (sl, sr, vv), _ = jax.lax.scan(body, (sl, sr, vv), None, length=STEPS)
        return sl, vv
    return run


def bench(name, step):
    run = scanned(step)
    out = run(score_l, score_r, v)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out = run(score_l, score_r, v)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / STEPS)
    print(f"{name}: {best * 1e6:9.1f} us/step", flush=True)
    return best


a = bench("fwd      xla  ", xla_fwd)
b = bench("fwd      flash", flash_fwd)
print(f"  fwd speedup     {a/b:.2f}x", flush=True)

ga = bench("fwd+bwd  xla  ", jax.grad(loss_of(xla_fwd), argnums=(0, 1, 2)))
gb = bench("fwd+bwd  flash", jax.grad(loss_of(flash_fwd), argnums=(0, 1, 2)))
print(f"  fwd+bwd speedup {ga/gb:.2f}x", flush=True)

o1 = jax.jit(xla_fwd)(score_l, score_r, v).astype(jnp.float32)
o2 = jax.jit(flash_fwd)(score_l, score_r, v).astype(jnp.float32)
err = float(jnp.max(jnp.abs(o1 - o2)))
print(f"max |xla - flash| fwd = {err:.3e}", flush=True)
