"""(Re)generate the golden fixtures in tests/data/.

Deterministic planted metagenomes + the pipeline's canonical report for
each. The reports are REGRESSION fixtures (the reference binary cannot be
compiled here — its megahit submodule is not checked out, VERDICT r1
missing #3); the planted ground truth in each *_truth.json is
reference-independent.

Run from the repo root:  python scripts/make_golden_fixtures.py
Only run to intentionally re-bless semantic changes (see CLAUDE.md).
"""

import json
import os
import sys

sys.path.insert(0, "tests")
sys.path.insert(0, ".")

from synthetic import make_crispr_array, make_metagenome, random_seq, sample_reads, write_fastq

import numpy as np

from mcaat_tpu.io.fastq import reverse_complement
from mcaat_tpu.pipeline import run_pipeline
from mcaat_tpu.settings import Settings

DATA = os.path.join("tests", "data")


def bless(name: str, input_files: str):
    s = Settings(
        input_files=input_files,
        output_file=os.path.join(DATA, f"{name}_CRISPR_Arrays.txt"),
    )
    s.mesh = "off"
    result = run_pipeline(s, verbose=False)
    print(f"{name}: {len(result.found_systems)} systems, "
          f"{sum(len(fs.spacers) for fs in result.found_systems)} spacers")
    return result


def main():
    # 0. the primary fixture: reads are pre-existing (do not regenerate
    # the input, only re-bless the report)
    if os.path.exists(os.path.join(DATA, "golden_reads.fq")):
        bless("golden", os.path.join(DATA, "golden_reads.fq"))

    # 1. RC-only: every read sampled from the reverse-complement strand
    rng = np.random.default_rng(101)
    arr_seq, repeat, spacers = make_crispr_array(rng, n_spacers=6)
    template = random_seq(rng, 300) + arr_seq + random_seq(rng, 300)
    fwd_reads = sample_reads(rng, template, read_len=100, coverage=40.0)
    bg = random_seq(rng, 2000)
    fwd_reads += sample_reads(rng, bg, read_len=100, coverage=5.0)
    rc_reads = [reverse_complement(r) for r in fwd_reads]
    write_fastq(os.path.join(DATA, "golden_rc_reads.fq"), rc_reads)
    json.dump(
        [{"repeat": repeat, "spacers": spacers, "sequence": arr_seq}],
        open(os.path.join(DATA, "golden_rc_truth.json"), "w"),
        indent=1,
    )
    bless("golden_rc", os.path.join(DATA, "golden_rc_reads.fq"))

    # 2. Mutated repeat: one middle repeat occurrence carries a point
    # mutation (the reference's extension scan tolerates point mutations,
    # tmp_utils.cpp:239-263)
    rng = np.random.default_rng(202)
    repeat = random_seq(rng, 30)
    spacers = [random_seq(rng, 34) for _ in range(6)]
    mut_pos = 15
    mut_repeat = (
        repeat[:mut_pos]
        + ("A" if repeat[mut_pos] != "A" else "C")
        + repeat[mut_pos + 1 :]
    )
    parts = []
    for i, sp in enumerate(spacers):
        parts.append(mut_repeat if i == 3 else repeat)
        parts.append(sp)
    parts.append(repeat)
    arr_seq = "".join(parts)
    template = random_seq(rng, 300) + arr_seq + random_seq(rng, 300)
    reads = sample_reads(rng, template, read_len=100, coverage=40.0)
    reads += sample_reads(rng, random_seq(rng, 2000), read_len=100, coverage=5.0)
    order = rng.permutation(len(reads))
    reads = [reads[i] for i in order]
    write_fastq(os.path.join(DATA, "golden_mut_reads.fq"), reads)
    json.dump(
        [{"repeat": repeat, "mutated_repeat": mut_repeat, "spacers": spacers,
          "sequence": arr_seq}],
        open(os.path.join(DATA, "golden_mut_truth.json"), "w"),
        indent=1,
    )
    bless("golden_mut", os.path.join(DATA, "golden_mut_reads.fq"))

    # 3. Paired-end: mates of the same fragments; mate-2 stored RC'd
    meta = make_metagenome(seed=303, n_arrays=1, n_spacers=6, coverage=40.0)
    reads = meta["reads"]
    half = len(reads) // 2
    write_fastq(os.path.join(DATA, "golden_pe_1.fq"), reads[:half])
    write_fastq(
        os.path.join(DATA, "golden_pe_2.fq"),
        [reverse_complement(r) for r in reads[half:]],
    )
    json.dump(
        meta["arrays"],
        open(os.path.join(DATA, "golden_pe_truth.json"), "w"),
        indent=1,
    )
    bless(
        "golden_pe",
        os.path.join(DATA, "golden_pe_1.fq")
        + " "
        + os.path.join(DATA, "golden_pe_2.fq"),
    )


if __name__ == "__main__":
    main()
