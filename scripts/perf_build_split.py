"""Stage split of the big single-pass graph build (62M windows w/RC).

Times each stage of the derived-node build (count edges, derive nodes,
adjacency) plus the full build_dbg_from_reads, to locate where big-build
time goes. Usage: python scripts/perf_build_split.py [R [L]]
"""

import sys
import time

import numpy as np

import mcaat_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from mcaat_tpu.graph.dbg import (
    _bucket_size,
    _reverse_complement_batch,
    build_adjacency_chunked,
    build_dbg_from_reads,
)
from mcaat_tpu.kmer.count import (
    _bucket_slice,
    count_unique,
    derive_nodes_from_edges,
    extract_kmers,
    extract_last_kmer,
)


def t(label, fn, reps=2):
    fn()  # compile
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.2f}s", flush=True)
    return r


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(R, L)).astype(np.uint8)
    lengths = np.full(R, L, dtype=np.int32)
    # same padding as build_dbg_from_reads
    R_pad = _bucket_size(R)
    L_pad = (L + 31) // 32 * 32
    codes2 = np.zeros((R_pad, L_pad), dtype=np.uint8)
    codes2[:R, :L] = codes
    lengths2 = np.zeros((R_pad,), dtype=np.int32)
    lengths2[:R] = lengths
    codes_j = jnp.asarray(codes2)
    lengths_j = jnp.asarray(lengths2)
    codes_rc, lengths_rc = _reverse_complement_batch(codes_j, lengths_j)
    codes_j = jnp.concatenate([codes_j, codes_rc], axis=0)
    lengths_j = jnp.concatenate([lengths_j, lengths_rc], axis=0)
    n_win = 2 * R * (L - 22)
    print(
        f"rows={codes_j.shape[0]} cols={codes_j.shape[1]} "
        f"windows={n_win/1e6:.0f}M sorted-slots="
        f"{codes_j.shape[0]*(codes_j.shape[1]-23)/1e6:.0f}M",
        flush=True,
    )

    st = {}

    def count_edges():
        km1 = extract_kmers(codes_j, lengths_j, 24).reshape(-1)
        u24, c24, n24 = count_unique(km1)
        st.update(u24=u24, c24=c24, n24=int(n24))
        return st["n24"]

    t("count_unique(24-mers)", count_edges)
    n24_i = st["n24"]
    e_keep = min(_bucket_size(n24_i), int(st["u24"].shape[0]))
    u24s, c24s = st["u24"][:e_keep], st["c24"][:e_keep]
    print(f"  n24={n24_i/1e6:.1f}M e_keep={e_keep/1e6:.1f}M", flush=True)

    def derive():
        last = extract_last_kmer(codes_j, lengths_j, 23)
        u_l, c_l, n_l = count_unique(last)
        u_l, c_l, _ = _bucket_slice(u_l, c_l, int(n_l))
        u23, c23, n23, u_id = derive_nodes_from_edges(
            u24s, c24s, jnp.int32(n24_i), u_l, c_l
        )
        st.update(u23=u23, c23=c23, n23=int(n23), u_id=u_id)
        return st["n23"]

    t("derive_nodes_from_edges", derive)
    n23_i = st["n23"]
    n_keep = min(_bucket_size(n23_i), int(st["u23"].shape[0]))
    u23 = st["u23"][:n_keep]
    u24_np = np.asarray(u24s)
    u_id_np = np.asarray(st["u_id"])
    print(f"  n23={n23_i/1e6:.1f}M n_keep={n_keep/1e6:.1f}M", flush=True)

    def adjacency():
        out, in_ = build_adjacency_chunked(
            u23, u24_np, n24_i, u_id=u_id_np, chunk_edges=32_000_000
        )
        return int(out[0])

    t("adjacency (dest-join only, 32M chunks)", adjacency)

    def full():
        g = build_dbg_from_reads(codes, lengths, chunk_windows=0)
        return int(g.mult[0])

    t("build_dbg_from_reads single-pass TOTAL", full)
    print(f"rate={n_win/1e6:.0f}M windows / total above", flush=True)

    stats = jax.devices()[0].memory_stats() or {}
    print(f"peak HBM {stats.get('peak_bytes_in_use', 0)/2**30:.2f} GiB", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
