"""Throughput of the production build step vs batch size (one process)."""

import time

import numpy as np

import mcaat_tpu  # noqa: F401
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


@jax.jit
def build_step(codes, lengths):
    km1 = extract_kmers(codes, lengths, K + 1).reshape(-1)
    u24, c24, n24 = count_unique(km1)
    last = extract_last_kmer(codes, lengths, K)
    u_l, c_l, _n_l = count_unique(last)
    u23, c23, n23, u_id = derive_nodes_from_edges(u24, c24, n24, u_l, c_l)
    out, in_ = _build_adjacency(u23, u24, n24, u_id=u_id)
    return n23, n24, jnp.sum(out >= 0)


def main():
    rng = np.random.default_rng(0)
    for n_reads in (100_000, 200_000, 400_000):
        length = 100
        codes = jnp.asarray(
            rng.integers(0, 4, size=(n_reads, length)).astype(np.uint8)
        )
        lengths = jnp.asarray(np.full(n_reads, length, dtype=np.int32))
        n_windows = n_reads * (length - K + 1)
        t0 = time.perf_counter()
        r = tuple(int(x) for x in build_step(codes, lengths))
        print(
            f"R={n_reads}: compile+run {time.perf_counter()-t0:.1f}s result={r}",
            flush=True,
        )
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            tuple(int(x) for x in build_step(codes, lengths))
        dt = (time.perf_counter() - t0) / iters
        print(
            f"R={n_reads}: {dt*1000:.1f} ms -> {n_windows/dt/1e6:.2f}M kmers/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
