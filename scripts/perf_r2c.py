"""TPU batch 2: Pallas DP A/B + fused-prefix marginal costs of the build.

The naive per-stage split (perf_r2b) is dominated by materializing huge
intermediates; here each prefix program returns only scalars, so the
difference between consecutive prefixes is the true in-fusion marginal
cost of the added stage.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import mcaat_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def timed(label, fn, *a, iters=3):
    t0 = time.perf_counter()
    r = fn(*a)
    jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, r)
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*a)
        jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, r)
        ts.append(time.perf_counter() - t0)
    print(f"{label:46s} {min(ts)*1e3:8.1f} ms   (compile {compile_s:.1f}s)", flush=True)
    return r, min(ts)


def main():
    from mcaat_tpu.graph.dbg import _build_adjacency
    from mcaat_tpu.kmer.count import (
        count_unique,
        derive_nodes_from_edges,
        extract_kmers,
        extract_last_kmer,
    )

    K = 23
    rng = np.random.default_rng(0)
    R, L = 100_000, 100
    codes = jnp.asarray(rng.integers(0, 4, size=(R, L)).astype(np.uint8))
    lengths = jnp.asarray(np.full(R, L, dtype=np.int32))
    n_windows = R * (L - K + 1)
    print(f"== fused-prefix marginals at {n_windows/1e6:.1f}M windows ==", flush=True)

    @jax.jit
    def p1_extract(codes, lengths):
        km1 = extract_kmers(codes, lengths, K + 1).reshape(-1)
        return jnp.sum(km1 & 1)

    @jax.jit
    def p2_count(codes, lengths):
        km1 = extract_kmers(codes, lengths, K + 1).reshape(-1)
        u24, c24, n24 = count_unique(km1)
        return n24, jnp.sum(c24)

    @jax.jit
    def p3_derive(codes, lengths):
        km1 = extract_kmers(codes, lengths, K + 1).reshape(-1)
        u24, c24, n24 = count_unique(km1)
        last = extract_last_kmer(codes, lengths, K)
        u_l, c_l, _ = count_unique(last)
        u23, c23, n23, u_id = derive_nodes_from_edges(u24, c24, n24, u_l, c_l)
        return n23, jnp.sum(c23), jnp.sum(u_id)

    @jax.jit
    def p4_full(codes, lengths):
        km1 = extract_kmers(codes, lengths, K + 1).reshape(-1)
        u24, c24, n24 = count_unique(km1)
        last = extract_last_kmer(codes, lengths, K)
        u_l, c_l, _ = count_unique(last)
        u23, c23, n23, u_id = derive_nodes_from_edges(u24, c24, n24, u_l, c_l)
        out, in_ = _build_adjacency(u23, u24, n24, u_id=u_id)
        return n23, n24, jnp.sum(out >= 0)

    _, t1 = timed("p1 extract only", lambda: p1_extract(codes, lengths))
    _, t2 = timed("p2 + count_unique(24)", lambda: p2_count(codes, lengths))
    _, t3 = timed("p3 + last/derive-nodes", lambda: p3_derive(codes, lengths))
    _, t4 = timed("p4 + adjacency (full build)", lambda: p4_full(codes, lengths))
    print(
        f"  marginals: extract {t1*1e3:.0f} | count24 {(t2-t1)*1e3:.0f} | "
        f"derive {(t3-t2)*1e3:.0f} | adjacency {(t4-t3)*1e3:.0f} ms",
        flush=True,
    )

    print("== pallas DP A/B ==", flush=True)
    from mcaat_tpu.report.batched_fuzz import _ratio_batch_scan, encode_batch
    from mcaat_tpu.report.pallas_dp import ratio_batch_pallas

    rng2 = np.random.default_rng(1)
    n_sp = 512
    spacers = [
        "".join("ACGT"[i] for i in rng2.integers(0, 4, size=34)) for _ in range(n_sp)
    ]
    codes_f, lens_f = encode_batch(spacers)
    ii, jj = np.meshgrid(np.arange(n_sp), np.arange(n_sp), indexing="ij")
    a_c = jnp.asarray(codes_f[ii.reshape(-1)])
    a_l = jnp.asarray(lens_f[ii.reshape(-1)])
    b_c = jnp.asarray(codes_f[jj.reshape(-1)])
    b_l = jnp.asarray(lens_f[jj.reshape(-1)])
    pairs = n_sp * n_sp
    try:
        (rp, t_p) = timed("ratio_batch_pallas 262k pairs", lambda: ratio_batch_pallas(a_c, a_l, b_c, b_l))
        (rs, t_s) = timed("ratio_batch (lax.scan) 262k pairs", lambda: _ratio_batch_scan(a_c, a_l, b_c, b_l))
        same = bool(jnp.max(jnp.abs(rp - rs)) < 1e-3)
        print(
            f"  parity: {same}; pallas {pairs/t_p/1e6:.1f}M pairs/s vs "
            f"scan {pairs/t_s/1e6:.2f}M pairs/s ({t_s/t_p:.0f}x)",
            flush=True,
        )
    except Exception as e:
        print(f"  pallas DP failed on TPU: {e}", flush=True)


if __name__ == "__main__":
    main()
