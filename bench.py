"""Benchmark: graph-build k-mer throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (Purpurax/mcaat) builds + searches a 1-billion-node
dBG in ~3 h on a multi-core CPU (readme.md:15) ≈ 92.6k nodes/s end-to-end;
its optimized start-node scan runs ≈ 100-133k nodes/s
(src/z_optimization_dev_notes.md:11). We report the device graph-build
stage rate in k-mer windows/s (the same unit of work as megahit's CX1
sort) and normalize against 100k/s.
"""

from __future__ import annotations

import json
import time

import numpy as np

import mcaat_tpu  # noqa: F401  (x64 config)
import jax
import jax.numpy as jnp

from mcaat_tpu.graph.dbg import _build_adjacency
from mcaat_tpu.kmer.count import (
    count_unique,
    derive_nodes_from_edges,
    extract_kmers,
    extract_last_kmer,
)

K = 23
BASELINE_NODES_PER_S = 100_000.0  # reference DLS-optimized rate (BASELINE.md)


def synth_reads(n_reads: int, length: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=(n_reads, length)).astype(np.uint8)
    lengths = np.full(n_reads, length, dtype=np.int32)
    return jnp.asarray(codes), jnp.asarray(lengths)


@jax.jit
def build_step(codes, lengths):
    # production build path (build_dbg_from_reads): single 24-mer
    # extraction + count; the 23-mer node table AND the per-edge source
    # ids are derived from the unique edge table (prefix identity), so
    # only the destination endpoint needs a sort-join (_join_lookup1) —
    # measured 1.29x over the two-sided fused join on v5e
    km1 = extract_kmers(codes, lengths, K + 1).reshape(-1)
    u24, c24, n24 = count_unique(km1)
    last = extract_last_kmer(codes, lengths, K)
    u_l, c_l, _n_l = count_unique(last)
    u23, c23, n23, u_id = derive_nodes_from_edges(u24, c24, n24, u_l, c_l)
    out, in_ = _build_adjacency(u23, u24, n24, u_id=u_id)
    return n23, n24, jnp.sum(out >= 0)


def main():
    n_reads, length = 100_000, 100
    codes, lengths = synth_reads(n_reads, length)
    n_windows = n_reads * (length - K + 1)

    def run():
        # materialize scalars: block_until_ready is unreliable over the
        # axon tunnel, so round-trip the (tiny) results to host
        return tuple(int(x) for x in build_step(codes, lengths))

    run()  # warmup/compile
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters

    kmers_per_s = n_windows / dt
    print(
        json.dumps(
            {
                "metric": "graph_build_kmers_per_s_per_chip",
                "value": round(kmers_per_s, 1),
                "unit": "kmers/s",
                "vs_baseline": round(kmers_per_s / BASELINE_NODES_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
