"""Find the real single-pass build ceiling post flat-adjacency fix.

The 24M-window chunk threshold dates from the [N,4]-padding OOM (32x HBM
blowup), which flat [4N] storage fixed. If 62M windows now fit single-
pass, the chunked path (12x slower: accumulate-merge chain) only needs to
kick in far later, with much bigger chunks.
"""

import time

import numpy as np

import mcaat_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from mcaat_tpu.graph.dbg import build_dbg_from_reads


def run(R, L, label, chunk):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(R, L)).astype(np.uint8)
    lengths = np.full(R, L, dtype=np.int32)
    n_windows = 2 * R * (L - 22)
    try:
        g = build_dbg_from_reads(codes, lengths, chunk_windows=chunk)
        t0 = time.perf_counter()
        g = build_dbg_from_reads(codes, lengths, chunk_windows=chunk)
        n_edges = int(jnp.sum(g.out >= 0))
        dt = time.perf_counter() - t0
        stats = jax.devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use", 0) / 2**30
        print(
            f"{label}: windows={n_windows/1e6:.0f}M nodes={g.size/1e6:.1f}M "
            f"edges={n_edges/1e6:.1f}M time={dt:.2f}s "
            f"rate={n_windows/dt/1e6:.2f}M kmers/s peakHBM={peak:.2f}GiB",
            flush=True,
        )
        del g
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)


def main():
    # single-pass (chunking disabled) at increasing scale
    run(400_000, 100, "62M single-pass", 0)
    run(650_000, 100, "101M single-pass", 0)
    run(650_000, 100, "101M chunked@48M", 48_000_000)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
