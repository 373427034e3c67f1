"""Pallas kernel correctness (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from mcaat_tpu.io.fastq import encode_sequences
from mcaat_tpu.kmer.count import SENTINEL, extract_kmers
from mcaat_tpu.kmer.pallas_kernels import extract_kmers_pallas


@pytest.mark.parametrize("k", [23, 24])
def test_extract_matches_xla(k):
    rng = np.random.default_rng(1)
    seqs = [
        "".join("ACGT"[i] for i in rng.integers(0, 4, size=rng.integers(10, 80)))
        for _ in range(500)
    ]
    b = encode_sequences(seqs)
    ref = np.asarray(extract_kmers(jnp.asarray(b.codes), jnp.asarray(b.lengths), k))
    got = np.asarray(
        extract_kmers_pallas(jnp.asarray(b.codes), jnp.asarray(b.lengths), k,
                             interpret=True)
    )
    assert (ref == got).all()


def test_extract_short_reads_all_sentinel():
    b = encode_sequences(["ACGT", "AC"])
    got = np.asarray(
        extract_kmers_pallas(jnp.asarray(b.codes), jnp.asarray(b.lengths), 23,
                             interpret=True)
    )
    assert got.shape == (2, 0) or (got == int(SENTINEL)).all()
