"""A/B the bench build step: old (count_nodes_and_edges + join2) vs
production (count 24-mers + derive_nodes_from_edges + join1).

One long-lived process (remote TPU compiles are slow); run in background.
"""

import time

import numpy as np

import mcaat_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from mcaat_tpu.graph.dbg import _build_adjacency
from mcaat_tpu.kmer.count import (
    count_nodes_and_edges,
    count_unique,
    derive_nodes_from_edges,
    extract_kmers,
    extract_last_kmer,
)

K = 23


@jax.jit
def build_step_old(codes, lengths):
    u23, c23, n23, u24, n24 = count_nodes_and_edges(codes, lengths, K)
    out, in_ = _build_adjacency(u23, u24, n24)
    return n23, n24, jnp.sum(out >= 0)


@jax.jit
def build_step_new(codes, lengths):
    km1 = extract_kmers(codes, lengths, K + 1).reshape(-1)
    u24, c24, n24 = count_unique(km1)
    last = extract_last_kmer(codes, lengths, K)
    u_l, c_l, _n_l = count_unique(last)
    u23, c23, n23, u_id = derive_nodes_from_edges(u24, c24, n24, u_l, c_l)
    out, in_ = _build_adjacency(u23, u24, n24, u_id=u_id)
    return n23, n24, jnp.sum(out >= 0)


def main():
    rng = np.random.default_rng(0)
    n_reads, length = 100_000, 100
    codes = jnp.asarray(rng.integers(0, 4, size=(n_reads, length)).astype(np.uint8))
    lengths = jnp.asarray(np.full(n_reads, length, dtype=np.int32))
    n_windows = n_reads * (length - K + 1)
    print(f"windows={n_windows/1e6:.2f}M", flush=True)

    for name, fn in [("old", build_step_old), ("new", build_step_new)]:
        t0 = time.perf_counter()
        r = tuple(int(x) for x in fn(codes, lengths))
        print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s result={r}", flush=True)
        iters = 4
        t0 = time.perf_counter()
        for _ in range(iters):
            r = tuple(int(x) for x in fn(codes, lengths))
        dt = (time.perf_counter() - t0) / iters
        print(
            f"{name}: {dt*1000:.1f} ms -> {n_windows/dt/1e6:.2f}M kmers/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
