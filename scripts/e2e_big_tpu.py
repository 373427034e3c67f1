"""BASELINE config-4 analog: large synthetic metagenome through the FULL
pipeline on one chip (chunked graph build, big-graph cycle scan, chunked
read mapping). ~100M k-mer windows with RC.

Usage: python scripts/e2e_big_tpu.py [n_arrays] [background_len] [background_coverage]

(background_coverage scales the window count at a FIXED node count —
the graph is determined by the genome, the window volume by coverage;
e.g. 400 62000000 10.4 ≈ 1B windows over the same 124.5M-node graph as
the 8.0-coverage 796M-window artifact.)
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np

import mcaat_tpu  # noqa: F401

from synthetic import make_metagenome, write_fastq
from mcaat_tpu.pipeline import run_pipeline
from mcaat_tpu.settings import Settings


def main():
    n_arrays = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    background_len = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    background_coverage = float(sys.argv[3]) if len(sys.argv) > 3 else 8.0
    coverage = 35.0
    t0 = time.time()
    meta = make_metagenome(
        seed=7,
        n_arrays=n_arrays,
        n_spacers=6,
        background_len=background_len,
        background_coverage=background_coverage,
        coverage=coverage,
    )
    write_fastq("/tmp/e2e_big_reads.fq", meta["reads"])
    n_reads = len(meta["reads"])
    n_windows = sum(len(r) - 23 + 1 for r in meta["reads"][:1000])
    est_windows = 2 * n_reads * (len(meta["reads"][0]) - 22)
    print(
        f"generated {n_reads} reads, {n_arrays} arrays, ~{est_windows/1e6:.0f}M "
        f"windows w/RC ({time.time()-t0:.1f}s)",
        flush=True,
    )

    s = Settings(
        input_files="/tmp/e2e_big_reads.fq",
        output_file="/tmp/e2e_big_CRISPR_Arrays.txt",
    )
    t1 = time.time()
    result = run_pipeline(s, verbose=True)
    dt = time.time() - t1
    print(f"END-TO-END cold: {n_reads} reads in {dt:.1f}s = {n_reads/dt:,.0f} reads/s",
          flush=True)
    t1 = time.time()
    result = run_pipeline(s, verbose=True)
    dt = time.time() - t1
    print(f"END-TO-END warm: {n_reads} reads in {dt:.1f}s = {n_reads/dt:,.0f} reads/s",
          flush=True)

    from mcaat_tpu.io.fastq import reverse_complement

    hits = 0
    total = 0
    for arr in meta["arrays"]:
        for sp in arr["spacers"]:
            total += 1
            core = sp[6:-6]
            if core in result.report_text or reverse_complement(core) in result.report_text:
                hits += 1
    print(f"planted spacer recovery: {hits}/{total}", flush=True)

    import json

    with open("/tmp/e2e_big_result.json", "w") as fh:
        json.dump(
            {
                "n_reads": n_reads,
                "n_arrays": n_arrays,
                "est_windows": est_windows,
                "warm_seconds": round(dt, 1),
                "warm_reads_per_s": round(n_reads / dt, 1),
                "spacer_recovery": f"{hits}/{total}",
                "n_systems": len(result.found_systems),
            },
            fh,
        )
    print("wrote /tmp/e2e_big_result.json", flush=True)


if __name__ == "__main__":
    main()
