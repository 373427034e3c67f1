"""Synthetic metagenome generator for end-to-end tests and benches.

Plants one or more CRISPR arrays (repeat–spacer–repeat–…) into random
genomic background and samples error-free reads at a chosen coverage —
the test-fixture analog of the reference's ``--benchmark`` ground-truth
workflow (reference src/main_run_and_debug.cpp:142-212).
"""

from __future__ import annotations

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_seq(rng: np.random.Generator, length: int) -> str:
    return "".join("ACGT"[i] for i in rng.integers(0, 4, size=length))


def make_crispr_array(
    rng: np.random.Generator,
    n_spacers: int = 6,
    repeat_len: int = 30,
    spacer_len: int = 34,
) -> tuple[str, str, list[str]]:
    """Returns (array_sequence, repeat, spacers)."""
    repeat = random_seq(rng, repeat_len)
    spacers = [random_seq(rng, spacer_len) for _ in range(n_spacers)]
    parts = []
    for sp in spacers:
        parts.append(repeat)
        parts.append(sp)
    parts.append(repeat)
    return "".join(parts), repeat, spacers


def sample_reads(
    rng: np.random.Generator,
    template: str,
    read_len: int = 100,
    coverage: float = 30.0,
) -> list[str]:
    n_reads = int(np.ceil(len(template) * coverage / read_len))
    starts = rng.integers(0, max(len(template) - read_len, 1), size=n_reads)
    return [template[s : s + read_len] for s in starts]


def make_metagenome(
    seed: int = 0,
    n_arrays: int = 1,
    n_spacers: int = 6,
    repeat_len: int = 30,
    spacer_len: int = 34,
    background_len: int = 2000,
    flank_len: int = 300,
    read_len: int = 100,
    coverage: float = 40.0,
    background_coverage: float = 5.0,
) -> dict:
    """Build a mock metagenome: arrays embedded in flanks + background DNA."""
    rng = np.random.default_rng(seed)
    arrays = []
    reads: list[str] = []
    for _ in range(n_arrays):
        arr_seq, repeat, spacers = make_crispr_array(
            rng, n_spacers=n_spacers, repeat_len=repeat_len, spacer_len=spacer_len
        )
        template = random_seq(rng, flank_len) + arr_seq + random_seq(rng, flank_len)
        arrays.append({"sequence": arr_seq, "repeat": repeat, "spacers": spacers})
        reads.extend(sample_reads(rng, template, read_len=read_len, coverage=coverage))
    if background_len:
        bg = random_seq(rng, background_len)
        reads.extend(
            sample_reads(rng, bg, read_len=read_len, coverage=background_coverage)
        )
    order = rng.permutation(len(reads))
    reads = [reads[i] for i in order]
    return {"arrays": arrays, "reads": reads}


def write_fastq(path: str, reads: list[str]) -> None:
    with open(path, "w") as fh:
        for i, seq in enumerate(reads):
            fh.write(f"@read{i}\n{seq}\n+\n{'I' * len(seq)}\n")


def write_fasta(path: str, reads: list[str]) -> None:
    with open(path, "w") as fh:
        for i, seq in enumerate(reads):
            fh.write(f">read{i}\n{seq}\n")


def make_bubble_tandem(
    rng: np.random.Generator,
    n_copies: int = 120,
    unit_len: int = 72,
    site_positions: tuple = (0, 24, 48),
    n_alleles: int = 8,
) -> str:
    """Tandem repeat whose dBG cycle carries three independent 2-base
    bubble sites with 8 alleles each: 8^3 = 512 distinct simple cycles of
    length 72 (> the reference's hardcoded cluster_bounds = 500,
    /root/reference/src/cycle_finder.cpp:132) — the >500-cycle tangle
    fixture. Sites are >= 24 bp apart (incl. the wrap) so no 23-window
    covers two sites and the bubbles stay independent; shared-node to
    allele-node multiplicity ratio is ~n_alleles << 500, so the
    reference's _BackgroundCheck admits every branch."""
    alleles = ["AA", "AC", "AG", "AT", "CA", "CC", "CG", "CT"][:n_alleles]
    base = random_seq(rng, unit_len)
    copies = []
    for _ in range(n_copies):
        u = list(base)
        for p in site_positions:
            a = alleles[int(rng.integers(0, n_alleles))]
            u[p : p + 2] = a
        copies.append("".join(u))
    return "".join(copies)


def make_mutated_repeat_array(
    rng: np.random.Generator,
    n_spacers: int = 6,
    repeat_len: int = 30,
    spacer_len: int = 34,
    mutation_prob: float = 0.5,
) -> tuple[str, str, list[str]]:
    """CRISPR array whose repeat COPIES carry independent point mutations
    (the reference's repeat extension tolerates single-base divergence,
    /root/reference/src/tmp_utils.cpp:212-264). Returns
    (array_sequence, consensus_repeat, spacers)."""
    repeat = random_seq(rng, repeat_len)
    spacers = [random_seq(rng, spacer_len) for _ in range(n_spacers)]
    parts = []
    for i in range(n_spacers + 1):
        copy = list(repeat)
        if rng.random() < mutation_prob:
            p = int(rng.integers(0, repeat_len))
            copy[p] = "ACGT"[(("ACGT".index(copy[p])) + 1 + int(rng.integers(0, 3))) % 4]
        parts.append("".join(copy))
        if i < n_spacers:
            parts.append(spacers[i])
    return "".join(parts), repeat, spacers
