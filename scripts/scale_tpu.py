"""Scale benchmark: graph build at ~100M k-mer instances on one chip
(BASELINE config 4 analog: "large synthetic metagenome, sharded graph
build, reads/s scaling" — single-chip leg)."""

import time

import numpy as np

import mcaat_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from mcaat_tpu.kmer.count import count_unique, extract_kmers
from mcaat_tpu.graph.dbg import _build_adjacency


@jax.jit
def build_step(codes, lengths):
    km23 = extract_kmers(codes, lengths, 23).reshape(-1)
    km24 = extract_kmers(codes, lengths, 24).reshape(-1)
    u23, c23, n23 = count_unique(km23)
    u24, _c24, n24 = count_unique(km24)
    out, in_ = _build_adjacency(u23, u24, n24)
    return n23, n24, jnp.sum(out >= 0)


def run(R, L, label):
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, size=(R, L)).astype(np.uint8))
    lengths = jnp.asarray(np.full(R, L, dtype=np.int32))
    n_windows = R * (L - 22)
    r = tuple(int(x) for x in build_step(codes, lengths))  # compile+run
    t0 = time.perf_counter()
    r = tuple(int(x) for x in build_step(codes, lengths))
    dt = time.perf_counter() - t0
    print(
        f"{label}: windows={n_windows/1e6:.0f}M nodes={r[0]/1e6:.1f}M "
        f"edges={r[1]/1e6:.1f}M time={dt:.2f}s rate={n_windows/dt/1e6:.2f}M kmers/s",
        flush=True,
    )
    try:
        stats = jax.devices()[0].memory_stats()
        print(f"  peak HBM: {stats.get('peak_bytes_in_use', 0)/2**30:.2f} GiB", flush=True)
    except Exception:
        pass


def main():
    run(100_000, 100, "small (7.8M windows)")
    run(400_000, 100, "medium (31M windows)")
    run(800_000, 100, "large (62M windows)")


if __name__ == "__main__":
    main()
