"""On-hardware validation sweep (run manually on a real TPU host).

Covers what CPU CI cannot: compiled Pallas kernels vs XLA at bench scale,
the remote-DMA all-to-all (degenerate on 1 chip; full parity with >= 2), and
a short compiled train step on each backend. Prints PASS/FAIL lines.

Usage: python scripts/validate_tpu.py [--quick]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return np.asarray(x[:1] if hasattr(x, "shape") and x.ndim else x)


def check(name, ok):
    print(f"{'PASS' if ok else 'FAIL'}: {name}", flush=True)
    return ok


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()
    results = []

    print("devices:", jax.devices(), flush=True)

    # 1. Pallas segment-sum vs XLA at medium scale
    from bignn_tpu.ops.pallas.segment import segment_sum_pallas

    rng = np.random.default_rng(0)
    e, n, f = (131072, 1000, 128) if args.quick else (1_000_000, 20_000, 128)
    seg = np.sort(rng.integers(0, n, e)).astype(np.int32)
    m = jax.device_put(rng.normal(size=(e, f)).astype(np.float32))
    sd = jax.device_put(seg)
    out = np.asarray(segment_sum_pallas(m, sd, n))
    ref = np.asarray(jax.ops.segment_sum(m, sd, num_segments=n,
                                         indices_are_sorted=True))
    ok = np.all(np.abs(out - ref) <= 1e-4 + 1e-3 * np.abs(ref))
    results.append(check(f"segment_sum_pallas parity (E={e})", ok))

    # 2. remote-DMA all-to-all: degenerate on 1 chip, parity when >= 2
    from jax.sharding import Mesh, PartitionSpec as P
    from bignn_tpu.ops.pallas.collectives import all_to_all_pallas

    tpu_devs = [d for d in jax.devices() if d.platform in ("tpu", "axon")]
    g = len(tpu_devs)
    mesh = Mesh(np.array(tpu_devs), ("graph",))
    x = jnp.asarray(rng.normal(size=(g, g, 8, 128)).astype(np.float32))

    def fp(x):
        return all_to_all_pallas(x[0], "graph", g)[None]

    def fl(x):
        if g == 1:
            return x
        return jax.lax.all_to_all(x[0], "graph", split_axis=0, concat_axis=0)[None]

    run = lambda f: np.asarray(jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=P("graph"), out_specs=P("graph"), check_vma=False
    ))(x))
    results.append(check(
        f"pallas all_to_all parity ({g} chip{'s' if g > 1 else ''})",
        np.allclose(run(fp), run(fl), atol=1e-6),
    ))

    # 3. short compiled train step on both backends
    import bignn_tpu.ops as ops
    from bignn_tpu.data import make_synthetic_ddi, prepare_device_data
    from bignn_tpu.models import BiGNN, BiGNNConfig
    from bignn_tpu.train import Trainer, TrainConfig

    ds = make_synthetic_ddi(num_drugs=200, feat_dim=16, seed=0)
    data = prepare_device_data(ds)
    model = BiGNN(BiGNNConfig.full_bignn(feat_dim=16, dim=64, heads=4))
    for backend in ("xla", "pallas"):
        ops.set_backend(backend)
        tr = Trainer(model, data, TrainConfig(epochs=1, batch_size=256))
        params, opt_state = tr.init()
        t0 = time.perf_counter()
        pos = jnp.asarray(ds.split_edges("train")[:256].astype(np.int32))
        mask = jnp.ones(256, jnp.float32)
        params, opt_state, loss = tr._train_step(
            params, opt_state, jax.random.key(0), pos, mask
        )
        ok = np.isfinite(float(loss))
        results.append(check(
            f"train step backend={backend} "
            f"(compile+step {time.perf_counter()-t0:.1f}s, loss {float(loss):.3f})",
            ok,
        ))
    ops.set_backend("auto")

    print(("ALL PASS" if all(results) else "FAILURES PRESENT"), flush=True)


if __name__ == "__main__":
    main()
