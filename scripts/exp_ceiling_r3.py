"""Probe the single-pass edge-COUNT memory ceiling (windows incl. RC).

r3 measured single-pass counting FINE at 302M windows w/RC (22.7s full
build warm, count 5.2s — 3x the chunked rate). This probes the count
stage alone at increasing window totals to find where the sort working
set exceeds v5e HBM, so the default chunk/single-pass budget can sit
just under it. Random reads are fine here: count_unique's memory is
data-independent (the sorts are full-width regardless of duplication);
derive/adjacency are NOT probed (their memory scales with the unique
count, which random data inflates ~6x vs real metagenomes).

Usage: python scripts/exp_ceiling_r3.py [windows_millions ...]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

import mcaat_tpu  # noqa: F401
import jax.numpy as jnp

from mcaat_tpu.kmer.count import count_unique, extract_kmers, revcomp_kmers

L = 100
K = 23


def probe(total_windows_m: int) -> bool:
    # total windows (incl RC) = 2 * R * (L - K)
    R = int(total_windows_m * 1e6) // (2 * (L - K))
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, size=(R, L)).astype(np.uint8))
    lengths = jnp.full((R,), L, dtype=jnp.int32)
    try:
        t0 = time.perf_counter()
        km1 = extract_kmers(codes, lengths, K + 1).reshape(-1)
        km1 = jnp.concatenate([km1, revcomp_kmers(km1, K + 1)])
        u, c, n = count_unique(km1)
        n_i = int(n)
        cold = time.perf_counter() - t0
        del u, c, km1
        t0 = time.perf_counter()
        km1 = extract_kmers(codes, lengths, K + 1).reshape(-1)
        km1 = jnp.concatenate([km1, revcomp_kmers(km1, K + 1)])
        u, c, n = count_unique(km1)
        n_i = int(n)
        warm = time.perf_counter() - t0
        print(
            f"== {total_windows_m}M windows: OK cold {cold:.1f}s warm {warm:.1f}s "
            f"({total_windows_m/warm:.0f}M windows/s) n_unique={n_i/1e6:.1f}M",
            flush=True,
        )
        del u, c, km1
        return True
    except Exception as e:  # noqa: BLE001 — OOM: record and stop
        print(
            f"== {total_windows_m}M windows: FAILED {type(e).__name__}: "
            f"{str(e)[:220]}",
            flush=True,
        )
        return False


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [336, 384, 432, 480]
    for s in sizes:
        if not probe(s):
            break
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
