"""IO tests. The reverse-complement cases mirror the reference's unit
tests (tests/test_reads.cpp:11-63)."""

import numpy as np
import pytest

from mcaat_tpu.io.fastq import (
    decode_kmer,
    encode_kmer,
    encode_sequences,
    read_sequences,
    reverse_complement,
)


def test_reverse_complement_palindromic():
    assert reverse_complement("ACGT") == "ACGT"


def test_reverse_complement_basic():
    assert reverse_complement("AAAA") == "TTTT"
    assert reverse_complement("ACCGGGTTTT") == "AAAACCCGGT"


def test_reverse_complement_non_acgt_passthrough_reversed():
    # non-ACGT characters pass through, reversed (tests/test_reads.cpp:51-63)
    assert reverse_complement("ANNT") == "ANNT"
    assert reverse_complement("XYZ") == "ZYX"


def test_encode_decode_kmer_roundtrip():
    km = "ACGTTGCAACGGTCCAGTTTACG"
    assert decode_kmer(encode_kmer(km), len(km)) == km


def test_encode_sequences_padding():
    batch = encode_sequences(["ACGT", "AA"])
    assert batch.codes.shape == (2, 4)
    assert list(batch.lengths) == [4, 2]
    assert list(batch.codes[0]) == [0, 1, 2, 3]
    assert list(batch.codes[1]) == [0, 0, 0, 0]  # padded with 0


def test_non_acgt_encodes_as_t():
    batch = encode_sequences(["ANGT"])
    assert batch.codes[0, 1] == 3


def test_fastq_parse(tmp_path):
    p = tmp_path / "r.fq"
    p.write_text("@r1\nACGT\n+\nIIII\n@r2\nGGCC\n+\nIIII\n")
    assert read_sequences(str(p)) == ["ACGT", "GGCC"]


def test_fasta_parse_multiline(tmp_path):
    p = tmp_path / "r.fa"
    p.write_text(">r1\nACGT\nTTAA\n>r2\nGGCC\n")
    assert read_sequences(str(p)) == ["ACGTTTAA", "GGCC"]


def test_fastq_gzip(tmp_path):
    import gzip

    p = tmp_path / "r.fq.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("@r1\nACGTACGT\n+\nIIIIIIII\n")
    assert read_sequences(str(p)) == ["ACGTACGT"]
