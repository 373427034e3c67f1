"""Measure the 302M-window graph build after the merge-stack fix.

r3 found the chunked build at 302M windows transfer-dominated: the
up-front host-staging policy (keyed on the window-count upper bound)
moved every chunk table through the remote-TPU tunnel — 143s of the
207s warm e2e (E2E_BIG_r3.json). This measures, on the same dataset
(e2e_big_tpu 150 23500000 analog):

  1. chunked build at the default 128M-window budget (device-resident
     merge stack), twice, with peak HBM;
  2. single-pass (chunk_windows=0) at 302M windows — does it fit, and
     what does the peak look like?  (new shapes => cold remote compiles)

Usage: python scripts/exp_build_302m.py [n_arrays] [background_len] [mode]
  mode: "chunked" | "single" | "both" (default both)
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np

import mcaat_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from mcaat_tpu.graph.dbg import build_dbg_from_reads
from mcaat_tpu.io.fastq import read_encoded_batch


def get_reads():
    n_arrays = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    background_len = int(sys.argv[2]) if len(sys.argv) > 2 else 23_500_000
    fq = f"/tmp/e2e_big_reads_{n_arrays}_{background_len}.fq"
    if not os.path.exists(fq):
        from synthetic import make_metagenome, write_fastq

        t0 = time.time()
        meta = make_metagenome(
            seed=7,
            n_arrays=n_arrays,
            n_spacers=6,
            background_len=background_len,
            background_coverage=8.0,
            coverage=35.0,
        )
        write_fastq(fq, meta["reads"])
        print(f"generated {len(meta['reads'])} reads ({time.time()-t0:.1f}s)",
              flush=True)
    return fq


def run(codes, lengths, label, chunk):
    n_windows = 2 * int(np.maximum(lengths.astype(np.int64) - 24 + 1, 0).sum())
    for attempt in ("cold", "warm"):
        try:
            t0 = time.perf_counter()
            g = build_dbg_from_reads(
                codes, lengths, chunk_windows=chunk, verbose=True
            )
            _ = int(g.out[0])
            dt = time.perf_counter() - t0
            stats = jax.devices()[0].memory_stats() or {}
            peak = stats.get("peak_bytes_in_use", 0) / 2**30
            print(
                f"== {label} {attempt}: {dt:.1f}s "
                f"({n_windows/dt/1e6:.1f}M windows/s) nodes={g.size/1e6:.1f}M "
                f"peakHBM={peak:.2f}GiB",
                flush=True,
            )
            del g
        except Exception as e:  # noqa: BLE001 — OOM etc: record and continue
            print(f"== {label} {attempt}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            return


def main():
    mode = sys.argv[3] if len(sys.argv) > 3 else "both"
    fq = get_reads()
    b = read_encoded_batch(fq)
    n_windows = 2 * int(np.maximum(b.lengths.astype(np.int64) - 23, 0).sum())
    print(f"{b.num_reads} reads, ~{n_windows/1e6:.0f}M 24-windows w/RC",
          flush=True)
    if mode in ("chunked", "both"):
        run(b.codes, b.lengths, "chunked@128M", 128_000_000)
    if mode in ("single", "both"):
        run(b.codes, b.lengths, "single-pass", 0)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
