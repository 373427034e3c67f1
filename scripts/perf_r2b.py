"""Round-2 TPU measurement batch (single long-lived process).

Stage split of the production build path, extraction-kernel A/B, and
batched-fuzz throughput vs roofline — the data behind VERDICT r1 items
5 (build dominant cost) and 8 (banded-DP justification).
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
    from mcaat_tpu.graph.dbg import _build_adjacency, _join_lookup1
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
    print(f"== build stage split at {n_windows/1e6:.1f}M windows ==", flush=True)

    # full production step
    @jax.jit
    def build_step(codes, lengths):
        km1 = extract_kmers(codes, lengths, K + 1).reshape(-1)
        u24, c24, n24 = count_unique(km1)
        last = extract_last_kmer(codes, lengths, K)
        u_l, c_l, _ = count_unique(last)
        u23, c23, n23, u_id = derive_nodes_from_edges(u24, c24, n24, u_l, c_l)
        out, in_ = _build_adjacency(u23, u24, n24, u_id=u_id)
        return n23, n24, jnp.sum(out >= 0)

    _, t_total = timed("build_step TOTAL", lambda: build_step(codes, lengths))
    print(f"  -> {n_windows/t_total/1e6:.2f}M kmers/s", flush=True)

    # stages (each materializes its output -> includes one extra transfer)
    ext24 = jax.jit(lambda c, l: extract_kmers(c, l, K + 1))
    (km24, t_ext) = timed("extract_kmers(24)", lambda: ext24(codes, lengths))
    km1 = km24.reshape(-1)
    cu = jax.jit(count_unique)
    (res24, t_cu) = timed("count_unique(24-mers)", lambda: cu(km1))
    u24, c24, n24 = res24
    lastf = jax.jit(lambda c, l: extract_last_kmer(c, l, K))
    (last, t_last) = timed("extract_last_kmer", lambda: lastf(codes, lengths))
    (resl, t_cul) = timed("count_unique(last)", lambda: cu(last))
    u_l, c_l, _ = resl
    dn = jax.jit(derive_nodes_from_edges)
    (resd, t_dn) = timed(
        "derive_nodes_from_edges", lambda: dn(u24, c24, n24, u_l, c_l)
    )
    u23, c23, n23, u_id = resd
    mask_k = (np.int64(1) << np.int64(2 * K)) - 1
    v = jax.jit(lambda e: e & jnp.int64(mask_k))(u24)
    jl = jax.jit(_join_lookup1)
    (_vid, t_join) = timed("_join_lookup1 (dest join)", lambda: jl(u23, v))
    ba = jax.jit(lambda a, b, c, d: _build_adjacency(a, b, c, u_id=d))
    (_adj, t_adj) = timed("_build_adjacency (join+scatter)", lambda: ba(u23, u24, n24, u_id))
    print(
        f"  stage sum ~ {1e3*(t_ext+t_cu+t_last+t_cul+t_dn+t_adj):.1f} ms "
        f"(total {1e3*t_total:.1f} ms)",
        flush=True,
    )

    # extraction A/B: the r1 Pallas extraction kernel FAILED Mosaic
    # compile on the v5e toolchain (64-bit values are unsupported in
    # Mosaic TPU kernels: "failed to legalize operation 'func.return'"
    # on the i64 output). Deleted; the XLA extract_kmers path fuses
    # into the build and is not the bottleneck (see perf_r2c marginals).

    print("== batched fuzz throughput vs roofline ==", flush=True)
    from mcaat_tpu.report.batched_fuzz import encode_batch, ratio_batch

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
    (_m, t_rm) = timed(
        f"ratio_batch {n_sp}x{n_sp} pairs", lambda: ratio_batch(a_c, a_l, b_c, b_l)
    )
    pairs = n_sp * n_sp
    # roofline estimate: DP is ~64 scan steps x ~10 VPU ops over [N,N]
    # int32 lanes; v5e VPU ~ 4e12 int-op/s -> ~64*10*pairs/4e12 s
    roof = 64 * 10 * pairs / 4e12
    print(
        f"  {pairs} pairs in {t_rm*1e3:.1f} ms = {pairs/t_rm/1e6:.1f}M pairs/s; "
        f"crude VPU roofline ~{roof*1e3:.3f} ms ({t_rm/roof:.0f}x off)",
        flush=True,
    )


if __name__ == "__main__":
    main()
