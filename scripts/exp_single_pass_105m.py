"""Does single-pass (unchunked) edge counting beat the 24M-window chunked
build at 105M windows? The 24M default predates the flat-adjacency fix and
the RC-bit-math rewrite; with both, the single count_unique's peak is
~concat(2x105M) int64 + sort buffers. Times build_dbg_from_reads at
several chunk_windows settings on the same reads.

Usage: python scripts/exp_single_pass_105m.py [fastq]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

import mcaat_tpu  # noqa: F401

from mcaat_tpu.graph.dbg import build_dbg_from_reads
from mcaat_tpu.io.fastq import read_encoded_batch


def main():
    fq = sys.argv[1] if len(sys.argv) > 1 else "/tmp/e2e_big_reads.fq"
    b = read_encoded_batch(fq)
    n_windows = 2 * int(np.maximum(b.lengths - 24 + 1, 0).sum())
    print(f"{b.num_reads} reads, ~{n_windows/1e6:.0f}M 24-windows w/RC", flush=True)

    for label, cw in (("chunk24M", 24_000_000), ("chunk48M", 48_000_000),
                      ("single", 0)):
        try:
            t0 = time.time()
            g = build_dbg_from_reads(
                b.codes, b.lengths, k=23, chunk_windows=cw, verbose=True
            )
            _ = int(g.out[0])
            cold = time.time() - t0
            t0 = time.time()
            g = build_dbg_from_reads(
                b.codes, b.lengths, k=23, chunk_windows=cw, verbose=True
            )
            _ = int(g.out[0])
            warm = time.time() - t0
            print(
                f"== {label}: cold {cold:.1f}s warm {warm:.1f}s "
                f"({n_windows/warm/1e6:.1f}M kmers/s) nodes={g.size}",
                flush=True,
            )
            del g
        except Exception as e:  # OOM etc: record and continue
            print(f"== {label}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
