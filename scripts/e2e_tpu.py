"""End-to-end pipeline timing at moderate scale on TPU (BASELINE config 2/4
analog): synthetic metagenome with many planted arrays."""

import sys
import time

sys.path.insert(0, "tests")

import numpy as np

import mcaat_tpu  # noqa: F401

from synthetic import make_metagenome, write_fastq
from mcaat_tpu.pipeline import run_pipeline
from mcaat_tpu.settings import Settings


def main():
    n_arrays = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    coverage = 35.0
    t0 = time.time()
    meta = make_metagenome(
        seed=123,
        n_arrays=n_arrays,
        n_spacers=6,
        background_len=200_000,
        background_coverage=8.0,
        coverage=coverage,
    )
    write_fastq("/tmp/e2e_reads.fq", meta["reads"])
    n_reads = len(meta["reads"])
    print(f"generated {n_reads} reads, {n_arrays} arrays ({time.time()-t0:.1f}s)",
          flush=True)

    s = Settings(
        input_files="/tmp/e2e_reads.fq", output_file="/tmp/e2e_CRISPR_Arrays.txt"
    )
    t1 = time.time()
    result = run_pipeline(s, verbose=True)
    dt = time.time() - t1
    print(f"END-TO-END (cold): {n_reads} reads in {dt:.1f}s = {n_reads/dt:,.0f} reads/s",
          flush=True)
    # steady state: all programs compiled in-process
    t1 = time.time()
    result = run_pipeline(s, verbose=False)
    dt = time.time() - t1
    print(result.profile.report(), flush=True)
    print(f"END-TO-END (warm): {n_reads} reads in {dt:.1f}s = {n_reads/dt:,.0f} reads/s",
          flush=True)

    # recovery stats
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


if __name__ == "__main__":
    main()
