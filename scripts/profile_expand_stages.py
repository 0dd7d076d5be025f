"""Amortized decomposition of _expand_compact: each stage re-implemented
standalone so its cost is measured in isolation (same shapes/dtypes)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

K = 8

def timed(body, *args, n=5, name=""):
    def run(*a):
        def step(c, i):
            out = body(i, *a)
            s = jax.tree.reduce(
                lambda x, y: x + y,
                jax.tree.map(lambda l: jnp.ravel(l)[0].astype(jnp.float32), out))
            return c + s, None
        tot, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(K))
        return tot
    jfn = jax.jit(run)
    np.asarray(jfn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); np.asarray(jfn(*args)); ts.append(time.perf_counter()-t0)
    print(f"{name:30s} {float(np.median(ts))/K*1e3:9.2f} ms/iter", flush=True)

def main():
    from bignn_tpu.data.datasets import load_npz_cache
    from bignn_tpu.models import BiGNN, BiGNNConfig
    from bignn_tpu.train import MinibatchTrainer, TrainConfig
    cache = _os.path.join(_os.path.dirname(__file__), "..", ".cache", "config4_100000.npz")
    ds = load_npz_cache(cache, "config4")
    model = BiGNN(BiGNNConfig.full_bignn(feat_dim=32, dim=128, heads=4))
    tr = MinibatchTrainer(model, ds, TrainConfig(lr=1e-3, epochs=1, batch_size=1024),
                          fanouts=(10, 5), max_drugs=16384)
    s = tr.sampler
    cb = jax.tree.map(jnp.asarray, s.sample_compact())
    tb = tr.tables
    D, NC, EC = cb.drug_budget, cb.node_cap, cb.edge_cap

    def slot_side(i, cb, tb):
        nodes = jnp.roll(cb.nodes, i).astype(jnp.int32)
        slot_valid = jnp.arange(D) < cb.n_real
        mol_ptr = tb.mol_ptr.astype(jnp.int32)
        mol_start = jnp.take(mol_ptr, nodes, mode="clip")
        n_per = jnp.where(slot_valid, jnp.take(mol_ptr, nodes + 1, mode="clip") - mol_start, 0)
        off = cb.pack_off.astype(jnp.int32)
        eptr = tb.mol_eptr.astype(jnp.int32)
        estart = jnp.take(eptr, nodes, mode="clip")
        e_per = jnp.where(slot_valid, jnp.take(eptr, nodes + 1, mode="clip") - estart, 0)
        ecum = jnp.cumsum(e_per)
        return n_per, off, estart, ecum

    timed(slot_side, cb, tb, name="slot side (D ops)")

    def node_side(i, cb, tb):
        n_per, off, estart, ecum = slot_side(i, cb, tb)
        row_pos = jnp.arange(NC, dtype=jnp.int32)
        off_eff = jnp.where(n_per > 0, off, NC)
        slot = jnp.maximum(tr._rank_slots(off_eff, NC) - 1, 0)
        slot_c = jnp.minimum(slot, D - 1)
        mol_start = jnp.take(tb.mol_ptr.astype(jnp.int32), jnp.roll(cb.nodes, i).astype(jnp.int32), mode="clip")
        node_tbl = jnp.stack([off, n_per, mol_start], axis=1)
        nrow = jax.lax.optimization_barrier(jnp.take(node_tbl, slot_c, axis=0, mode="clip"))
        local_row = row_pos - nrow[:, 0]
        row_valid = (local_row >= 0) & (local_row < nrow[:, 1])
        node_rows = nrow[:, 2] + local_row
        return slot_c, row_valid, node_rows

    timed(node_side, cb, tb, name="node side (no feat)")

    def node_feat(i, cb, tb):
        slot_c, row_valid, node_rows = node_side(i, cb, tb)
        feat_rows = jax.lax.optimization_barrier(
            jnp.take(tb.feat, jnp.maximum(node_rows, 0), axis=0, mode="clip"))
        return jnp.where(row_valid[:, None], feat_rows, 0.0)

    timed(node_feat, cb, tb, name="node side + feat")

    def edge_rank(i, cb, tb):
        n_per, off, estart, ecum = slot_side(i, cb, tb)
        eslot = tr._rank_slots(ecum, EC)
        return eslot

    timed(edge_rank, cb, tb, name="slot + edge rank")

    def edge_rows(i, cb, tb):
        n_per, off, estart, ecum = slot_side(i, cb, tb)
        ecum0 = jnp.concatenate([jnp.zeros(1, ecum.dtype), ecum])
        eslot = tr._rank_slots(ecum, EC)
        edge_tbl = jnp.stack([jnp.pad(off, (0, 1)), jnp.pad(estart, (0, 1)), ecum0], axis=1)
        erow = jax.lax.optimization_barrier(jnp.take(edge_tbl, eslot, axis=0, mode="clip"))
        epos = jnp.arange(EC, dtype=jnp.int32)
        erows = erow[:, 1] + (epos - erow[:, 2])
        return erows, erow

    timed(edge_rows, cb, tb, name="... + erow gather")

    def edge_packed(i, cb, tb):
        erows, erow = edge_rows(i, cb, tb)
        packed = jax.lax.optimization_barrier(jnp.take(
            tb.edge_packed, jnp.clip(erows, 0, tb.edge_packed.shape[0] - 1), axis=0))
        return packed

    timed(edge_packed, cb, tb, name="... + packed gather")

    def edge_full(i, cb, tb):
        n_per, off, estart, ecum = slot_side(i, cb, tb)
        ecum0 = jnp.concatenate([jnp.zeros(1, ecum.dtype), ecum])
        etotal = ecum[-1]
        eslot = tr._rank_slots(ecum, EC)
        edge_tbl = jnp.stack([jnp.pad(off, (0, 1)), jnp.pad(estart, (0, 1)), ecum0], axis=1)
        erow = jax.lax.optimization_barrier(jnp.take(edge_tbl, eslot, axis=0, mode="clip"))
        epos = jnp.arange(EC, dtype=jnp.int32)
        node_off = erow[:, 0]
        erows = erow[:, 1] + (epos - erow[:, 2])
        evalid = epos < etotal
        packed = jax.lax.optimization_barrier(jnp.take(
            tb.edge_packed, jnp.clip(erows, 0, tb.edge_packed.shape[0] - 1), axis=0))
        edge_src = jnp.where(evalid, packed[:, 0] + node_off, 0)
        edge_dst = jnp.where(evalid, packed[:, 1] + node_off, NC)
        edge_w = jnp.where(evalid, jax.lax.bitcast_convert_type(packed[:, 2], jnp.float32), 0.0)
        sperm = jnp.where(evalid, erow[:, 2] + packed[:, 3], epos)
        ssorted = jnp.where(evalid, packed[:, 4] + node_off, NC)
        tsrc = jnp.where(evalid, packed[:, 5] + node_off, 0)
        tw = jnp.where(evalid, jax.lax.bitcast_convert_type(packed[:, 6], jnp.float32), 0.0)
        estarts = jnp.take(ecum0, cb.block_slot0.astype(jnp.int32), mode="clip")
        return edge_src, edge_dst, edge_w, sperm, ssorted, tsrc, tw, estarts

    timed(edge_full, cb, tb, name="edge side full")
    timed(lambda i, cb, tb: tr._expand_compact(cb.replace(nodes=jnp.roll(cb.nodes, i)), tb),
          cb, tb, name="FULL expand")

if __name__ == "__main__":
    main()
