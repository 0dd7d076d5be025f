"""Config-#4 roofline accounting (VERDICT r2 item 1/2).

Anchors: measured HBM copy bandwidth on THIS chip (big-array copy and
superrow-gather rates), then per-stage bytes-moved estimates vs measured
amortized stage times -> %-of-roofline per stage. Also times the device
sampler's sub-stages. Prints a markdown table for docs/DESIGN.md.

Run on the TPU: python scripts/profile_roofline.py
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from bignn_tpu.data.datasets import load_npz_cache
from bignn_tpu.models import BiGNN, BiGNNConfig
from bignn_tpu.train import MinibatchTrainer, TrainConfig


def timed_scan(body, *args, n=64, reps=3):
    """Amortized per-iteration seconds of body(i, *args) inside one scan.

    Anti-DCE: every output leaf is FULLY summed (not sliced) and the running
    scalar feeds the next iteration, so XLA cannot skip or reorder the work.
    A pure elementwise body can still fuse with its reduction — use
    carry-threading (timed_carry) for raw-bandwidth anchors."""
    @jax.jit
    def run(*a):
        def step(c, i):
            out = body(i + c.astype(jnp.int32) * 0, *a)
            leaves = [jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree.leaves(out)]
            return c + sum(leaves), None
        c, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(n))
        return c

    float(run(*args))  # forced D2H (block_until_ready unreliable on tunnel)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def timed_carry(f, x0, *consts, n=16, reps=3):
    """Amortized per-iteration seconds of x = f(x, *consts): the full array
    is the scan carry, so each iteration's output must materialize. Big
    operands go in ``consts`` (jit ARGUMENTS — closures would bake them into
    the HLO as literals). ``f`` must not collapse under self-composition
    (use an LCG-style data dependency, not xor-with-constant)."""
    @jax.jit
    def run(x, *cs):
        def step(x, _):
            return f(x, *cs), None
        x, _ = jax.lax.scan(step, x, None, length=n)
        return x

    def force(x):  # fetch one element: waits for the whole chain (D2H;
        import numpy as _np  # block_until_ready unreliable on tunnel)
        return _np.asarray(jax.tree.leaves(x)[0].ravel()[0])

    force(run(x0, *consts))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        force(run(x0, *consts))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    cache = _os.path.join(_os.path.dirname(__file__), "..", ".cache",
                          "config4_100000.npz")
    ds = load_npz_cache(cache, "config4")
    model = BiGNN(dataclasses.replace(
        BiGNNConfig.full_bignn(feat_dim=32, dim=128, heads=4),
        dtype="bfloat16"))
    tr = MinibatchTrainer(
        model, ds, TrainConfig(lr=1e-3, epochs=1, batch_size=1024),
        fanouts=(10,), max_drugs=16384, device_sample=True,
        dispatch_chunk=8)
    s = tr.sampler
    dev = tr.dsampler
    consts = tr._dev_consts
    tb = tr.tables
    params, opt_state = tr.init()

    D, NC, EC, OE = s.drug_budget, s.node_cap, s.edge_cap, s.outer_edge_cap
    NCd = dev.NC  # device-calibrated node cap (class-pack extent)
    dim = 128
    print(f"caps: D={D} NC(host)={NC} NC(device)={NCd} EC={EC} OE={OE}",
          flush=True)

    # ---- hardware anchors (carry-threaded: cannot be DCE'd/fused away) ----
    big = jnp.arange(128 * 1024 * 1024 // 4, dtype=jnp.int32)  # 128 MB
    t = timed_carry(lambda x: x * x + 1664525, big, n=16)  # non-affine: no collapse
    copy_bw = 2 * big.nbytes / t  # read + write
    print(f"int32 sq stream: {copy_bw/1e9:.0f} GB/s "
          f"({t*1e3:.2f} ms / 128MB)", flush=True)
    bigf = jnp.ones(128 * 1024 * 1024 // 4, jnp.float32)
    t = timed_carry(lambda x: x * x + 1.5, bigf, n=16)
    copy_bw = max(copy_bw, 2 * bigf.nbytes / t)
    print(f"f32 sq stream: {2*bigf.nbytes/t/1e9:.0f} GB/s", flush=True)
    bigh = jnp.ones(256 * 1024 * 1024 // 2, jnp.bfloat16)
    t = timed_carry(lambda x: x * x + jnp.bfloat16(1.5), bigh, n=16)
    print(f"bf16 sq stream: {2*bigh.nbytes/t/1e9:.0f} GB/s", flush=True)
    copy_bw = max(copy_bw, 2 * bigh.nbytes / t)

    # MXU anchor: [4096,4096] bf16 matmul chain
    mm = jnp.ones((4096, 4096), jnp.bfloat16)
    t = timed_carry(
        lambda x: (x @ x * jnp.bfloat16(1e-4)).astype(jnp.bfloat16), mm, n=8)
    flops = 2 * 4096**3
    print(f"bf16 4096^3 matmul: {flops/t/1e12:.0f} TFLOP/s", flush=True)

    # superrow gather rate at the expansion's actual shapes: output is the
    # carry (index vector re-derived from the gathered values each iter,
    # defeating caching/DCE); tables are jit args, not closure constants
    rng = np.random.default_rng(0)
    ep = tb.edge_packed
    eidx = jnp.asarray(rng.integers(0, ep.shape[0], EC // s.r_edge),
                       jnp.int32)
    g = timed_carry(
        lambda ix, tbl: (jnp.take(tbl, ix, axis=0).sum(axis=1)
                         .astype(jnp.int32) + ix) % tbl.shape[0],
        eidx, ep, n=16)
    gbytes = EC // s.r_edge * ep.shape[1] * 4
    print(f"edge superrow gather: {g*1e3:.2f} ms for {gbytes/1e6:.0f} MB "
          f"-> {gbytes/g/1e9:.0f} GB/s", flush=True)
    ft = tb.feat
    nidx = jnp.asarray(rng.integers(0, ft.shape[0], NC // s.r_node),
                       jnp.int32)
    g = timed_carry(
        lambda ix, tbl: (jnp.take(tbl, ix, axis=0).sum(axis=1)
                         .astype(jnp.int32) + ix) % tbl.shape[0],
        nidx, ft, n=16)
    fbytes = NC // s.r_node * ft.shape[1] * ft.dtype.itemsize
    print(f"feat superrow gather: {g*1e3:.2f} ms for {fbytes/1e6:.0f} MB "
          f"-> {fbytes/g/1e9:.0f} GB/s", flush=True)

    # sort rate anchor (the device sampler is sort-heavy)
    arr = jnp.asarray(rng.integers(0, 1 << 30, 131072), jnp.int32)
    t = timed_carry(lambda x: jnp.sort(x * 1664525 + 1013904223), arr, n=16)
    print(f"sort 128K int32: {t*1e3:.2f} ms", flush=True)
    t = timed_carry(
        lambda x: jnp.argsort(x * 1664525 + 1013904223).astype(jnp.int32),
        arr, n=16)
    print(f"argsort 128K int32: {t*1e3:.2f} ms", flush=True)

    # ---- stage timings ----------------------------------------------------
    # Every stage body consumes a DIFFERENT batch each iteration (cycling
    # through K presampled batches via dynamic indexing). The r3 version
    # varied only one field (jnp.roll(nodes) / emb+i) and XLA hoisted every
    # computation depending on the unvaried fields OUT of the scan — the
    # outer stage lost its per-step src-sort derivation and the expand
    # sub-stage was credited a wrong block_adjacency cost ("[MEASUREMENT
    # BUG - wrong estarts]" in ROOFLINE_r3). Cycling whole batches keeps
    # every per-batch op inside the loop.
    key0 = dev.key_at(0, 0)

    t_samp = timed_scan(
        lambda i, c: dev.sample(c, jax.random.fold_in(key0, i))[0], consts,
        n=32)
    print(f"\nSTAGE device-sample: {t_samp*1e3:.2f} ms", flush=True)

    K = 4
    cbs = [jax.jit(dev.sample)(consts, dev.key_at(0, j))[0] for j in range(K)]
    cbk = jax.tree.map(lambda *xs: jnp.stack(xs), *cbs)

    def at(stacked, i):
        return jax.tree.map(lambda x: x[i % K], stacked)

    t_exp = timed_scan(
        lambda i, cbk, tb: tr._expand_compact(at(cbk, i), tb), cbk, tb, n=32)
    print(f"STAGE expand: {t_exp*1e3:.2f} ms", flush=True)

    # expand sub-stage: the dense block-diagonal adjacency build
    from bignn_tpu.ops import block_adjacency

    pbs = [jax.jit(tr._expand_compact)(cb, tb) for cb in cbs]
    adjk = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[(pb.edge_src, pb.edge_dst, pb.block_estarts) for pb in pbs])
    t_adj = timed_scan(
        lambda i, ak: block_adjacency(
            ak[0][i % K], ak[1][i % K], None, ak[2][i % K], NCd,
            jnp.int8),
        adjk, n=32)
    print(f"  sub: block_adjacency build (int8, device cap): "
          f"{t_adj*1e3:.2f} ms", flush=True)

    pbk = jax.tree.map(lambda *xs: jnp.stack(xs), *pbs)
    t_inner = timed_scan(
        lambda i, p, pbk: model.encode_inner(p, at(pbk, i)), params, pbk,
        n=32)
    print(f"STAGE inner (fwd): {t_inner*1e3:.2f} ms", flush=True)

    embs = [jax.jit(model.encode_inner)(params, pb) for pb in pbs]
    embk = jnp.stack(embs)
    t_outer = timed_scan(
        lambda i, p, ek, cbk, tb: model.propagate_outer(
            p, ek[i % K], tr._derive_outer(at(cbk, i), tb)),
        params, embk, cbk, tb, n=32)
    print(f"STAGE outer (fwd, incl derive): {t_outer*1e3:.2f} ms", flush=True)

    t_fwd = timed_scan(
        lambda i, p, cbk, tb: tr._forward(p, at(cbk, i), tb),
        params, cbk, tb, n=32)
    print(f"STAGE forward total: {t_fwd*1e3:.2f} ms", flush=True)

    # keep ALL outputs (params/opt_state too) or XLA DCEs the backward
    t_step = timed_scan(
        lambda i, p, o, cbk, tb: tr._step(p, o, at(cbk, i), tb),
        params, opt_state, cbk, tb, n=32)
    print(f"STAGE full step (fwd+bwd+adam): {t_step*1e3:.2f} ms", flush=True)

    t_full = timed_scan(
        lambda i, p, o, c, tb: tr._step(
            p, o, dev.sample(c, jax.random.fold_in(key0, i))[0], tb),
        params, opt_state, consts, tb, n=32)
    print(f"STAGE sample+step (the sustained scan body): {t_full*1e3:.2f} ms",
          flush=True)

    # ---- params-carried scans (the BENCH definitions: real training
    # serializes the step chain through the params/opt carry; the
    # cycling-batch scans above let XLA pipeline independent iterations
    # and read ~5-10% faster) --------------------------------------------
    cb8 = [jax.jit(dev.sample)(consts, dev.key_at(9, j))[0] for j in range(8)]
    st8 = jax.tree.map(lambda *xs: jnp.stack(xs), *cb8)

    @jax.jit
    def ceil_scan(p, o, st, tbl):
        def body(carry, hb):
            p, o = carry
            p, o, loss = tr._step(p, o, hb, tbl)
            return (p, o), loss
        return jax.lax.scan(body, (p, o), st)[1]

    @jax.jit
    def sust_scan(p, o, c, tbl, k0):
        def body(carry, i):
            p, o = carry
            hb, _ = dev.sample(c, jax.random.fold_in(k0, i))
            p, o, loss = tr._step(p, o, hb, tbl)
            return (p, o), loss
        return jax.lax.scan(body, (p, o),
                            jnp.arange(32, dtype=jnp.int32))[1]

    np.asarray(ceil_scan(params, opt_state, st8, tb))
    t_ceil = min(_time_once(lambda: np.asarray(
        ceil_scan(params, opt_state, st8, tb))) / 8 for _ in range(3))
    np.asarray(sust_scan(params, opt_state, consts, tb, key0))
    t_sust = min(_time_once(lambda: np.asarray(
        sust_scan(params, opt_state, consts, tb, key0))) / 32
        for _ in range(3))
    print(f"\nCARRIED ceiling scan: {t_ceil*1e3:.2f} ms; "
          f"sustained scan: {t_sust*1e3:.2f} ms", flush=True)

    # ---- anchor composition table (the acceptance accounting:
    # stage time vs the serial sum of its own measured primitive anchors
    # on THIS chip; >=85% means the residual is the chip's, not the
    # program's; >100% means XLA overlaps the primitives) ----------------
    ecs = EC // s.r_edge
    # anchors (measured above): per-row gather latency, MXU dot floor,
    # bf16 stream, per-op floors for sort/scatter (probe_sampler_ops.py)
    row_ns = 20e-9
    a_sample = 4.4e-3 * 0 + (  # serial sum of the draw's heavy ops
        0.19e-3 * 2      # seeds sorted_unique (2 small sorts, upper bound)
        + 0.19e-3 * 2    # join-dedup 2 x 45K sorts
        + (self_fc := 4096) * 2 * row_ns  # adj_ptr gathers
        + 8192 * 2 * row_ns  # window row gathers (2 aligned rows/frontier)
        + 0.19e-3 * 2    # outer sorted_unique
        + 0.45e-3        # final 2-operand sort 59K
        + 0.35e-3        # inv scatter
        + 0.25e-3 * 2    # local scatter + out2 scatter
        + 41_000 * row_ns  # la localization gather
        + 0.3e-3)        # cumsums + elementwise streams
    a_expand = (
        ecs * row_ns + (NCd // s.r_node) * row_ns      # superrow gathers
        + (NCd / 128) * 0.86e-6                        # adj MXU dot floor
        + (EC * 4 * 3 + NCd * 32 * 2 + NCd * 128 * 1) / copy_bw)  # writes
    a_inner = (2 * ((NCd * 128 * 1) / copy_bw          # int8 adj reads
                    + 3 * (NCd * dim * 2) / copy_bw)   # h streams
               + 2 * (NCd * dim * (32 + dim) * 2 + NCd * 128 * dim * 2)
               / 31e12)                                # MLP + agg FLOPs
    a_outer = (OE * 2 * row_ns                         # score gathers
               + OE * row_ns * 1                       # v row gather
               + 0.2e-3 * 4                            # segment kernels
               + 0.3e-3)                               # elementwise
    rows = [
        ("device sample", t_samp, a_sample),
        ("expand (incl adj build)", t_exp, a_expand),
        ("inner fwd", t_inner, a_inner),
        ("outer fwd", t_outer, a_outer),
        ("bwd+adam", t_step - t_fwd, 2 * (a_inner + a_outer) + 1e-3),
    ]
    print("\n| stage | measured ms | serial anchor ms | % of anchor |",
          flush=True)
    print("|---|---|---|---|", flush=True)
    for name, m, a in rows:
        print(f"| {name} | {m*1e3:.2f} | {a*1e3:.2f} | {a/m*100:.0f}% |",
              flush=True)
    print({
        "sample_ms": round(t_samp * 1e3, 2),
        "expand_ms": round(t_exp * 1e3, 2),
        "inner_ms": round(t_inner * 1e3, 2),
        "outer_ms": round(t_outer * 1e3, 2),
        "fwd_ms": round(t_fwd * 1e3, 2),
        "step_ms": round(t_step * 1e3, 2),
        "sample_step_ms": round(t_full * 1e3, 2),
        "ceiling_scan_ms": round(t_ceil * 1e3, 2),
        "sustained_scan_ms": round(t_sust * 1e3, 2),
        "copy_bw_GBs": round(copy_bw / 1e9, 1),
    }, flush=True)


def _time_once(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
