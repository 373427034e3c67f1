"""k-mer extraction/counting vs a naive Python model (SURVEY §4 strategy)."""

from collections import Counter

import numpy as np
import jax.numpy as jnp

from mcaat_tpu.io.fastq import encode_kmer, encode_sequences
from mcaat_tpu.kmer.count import count_kmers_for_reads, extract_kmers, SENTINEL


def naive_counts(seqs: list[str], k: int) -> Counter:
    c: Counter = Counter()
    for s in seqs:
        s = "".join(ch if ch in "ACGT" else "T" for ch in s.upper())
        for i in range(len(s) - k + 1):
            c[s[i : i + k]] += 1
    return c


def test_extract_kmers_masks_short_reads():
    batch = encode_sequences(["ACGTACGTA", "ACG"])
    km = np.asarray(extract_kmers(jnp.asarray(batch.codes), jnp.asarray(batch.lengths), 4))
    assert km.shape == (2, 6)
    assert km[0, 0] == encode_kmer("ACGT")
    assert (km[1] == int(SENTINEL)).all()  # read shorter than k


def test_counts_match_naive():
    rng = np.random.default_rng(1)
    seqs = ["".join("ACGT"[i] for i in rng.integers(0, 4, size=60)) for _ in range(50)]
    k = 7
    batch = encode_sequences(seqs)
    unique, counts = count_kmers_for_reads(batch.codes, batch.lengths, k)
    expected = naive_counts(seqs, k)
    got = {int(u): int(c) for u, c in zip(unique, counts)}
    expected_packed = {encode_kmer(km): c for km, c in expected.items()}
    assert got == expected_packed
    # sortedness
    assert (np.diff(unique) > 0).all()


def test_counts_k23():
    seqs = ["ACGTACGTTGCAACGGTCCAGTTTACGCATCG"] * 4
    batch = encode_sequences(seqs)
    unique, counts = count_kmers_for_reads(batch.codes, batch.lengths, 23)
    assert len(unique) == len(seqs[0]) - 22
    assert (counts == 4).all()
