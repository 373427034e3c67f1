"""Scale benchmark: graph build up to ~180M k-mer instances on one chip
(BASELINE config 4 analog: "large synthetic metagenome, sharded graph
build, reads/s scaling" — single-chip leg). Large configs exercise the
chunked counting + chunked adjacency path."""

import time

import numpy as np

import mcaat_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from mcaat_tpu.graph.dbg import build_dbg_from_reads


def run(R, L, label):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(R, L)).astype(np.uint8)
    lengths = np.full(R, L, dtype=np.int32)
    n_windows = 2 * R * (L - 22)  # both strands
    g = build_dbg_from_reads(codes, lengths)  # compile+run
    t0 = time.perf_counter()
    g = build_dbg_from_reads(codes, lengths)
    dt = time.perf_counter() - t0
    n_edges = int(jnp.sum(g.out >= 0))
    print(
        f"{label}: windows={n_windows/1e6:.0f}M nodes={g.size/1e6:.1f}M "
        f"edges={n_edges/1e6:.1f}M time={dt:.2f}s rate={n_windows/dt/1e6:.2f}M kmers/s",
        flush=True,
    )
    try:
        stats = jax.devices()[0].memory_stats()
        print(f"  peak HBM: {stats.get('peak_bytes_in_use', 0)/2**30:.2f} GiB", flush=True)
    except Exception:
        pass


def main():
    run(100_000, 100, "small (15.6M windows w/ RC)")
    run(400_000, 100, "medium (62M windows w/ RC)")
    run(1_200_000, 100, "large (187M windows w/ RC, chunked)")


if __name__ == "__main__":
    main()
