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
