"""Chunked (memory-bounded) counting must equal single-pass counting."""

import numpy as np
import jax.numpy as jnp

from mcaat_tpu.graph.dbg import build_dbg_from_reads
from mcaat_tpu.io.fastq import encode_sequences
from mcaat_tpu.kmer.count import (
    count_unique,
    count_unique_chunked,
    extract_kmers,
    merge_counted,
)


def test_merge_counted():
    ua = jnp.array([2, 5, 9], dtype=jnp.int64)
    ca = jnp.array([1, 2, 3], dtype=jnp.int32)
    ub = jnp.array([2, 7, 9], dtype=jnp.int64)
    cb = jnp.array([4, 5, 6], dtype=jnp.int32)
    u, c, n, ovf = merge_counted(ua, ca, ub, cb)
    n = int(n)
    assert u[:n].tolist() == [2, 5, 7, 9]
    assert c[:n].tolist() == [5, 2, 5, 9]
    assert int(ovf) == 0


def test_merge_counted_overflow_guard():
    # a NON-unique input violates the bounded-run contract; the overflow
    # scalar must flag it (counts are corrupt in that case)
    ua = jnp.array([2, 2, 9], dtype=jnp.int64)
    ca = jnp.array([1, 2, 3], dtype=jnp.int32)
    ub = jnp.array([2, 7, 9], dtype=jnp.int64)
    cb = jnp.array([4, 5, 6], dtype=jnp.int32)
    _u, _c, _n, ovf = merge_counted(ua, ca, ub, cb)
    assert int(ovf) > 0


def test_chunked_matches_single_pass():
    rng = np.random.default_rng(8)
    seqs = [
        "".join("ACGT"[i] for i in rng.integers(0, 4, size=70)) for _ in range(200)
    ]
    # duplicate some reads so counts exceed 1 across chunk boundaries
    seqs = seqs + seqs[:50]
    b = encode_sequences(seqs)
    k = 13
    km = extract_kmers(jnp.asarray(b.codes), jnp.asarray(b.lengths), k).reshape(-1)
    u_ref, c_ref, n_ref = count_unique(km)
    n_ref = int(n_ref)
    u_chk, c_chk, n_chk = count_unique_chunked(b.codes, b.lengths, k, chunk_rows=37)
    assert n_chk == n_ref
    assert (np.asarray(u_chk[:n_chk]) == np.asarray(u_ref[:n_ref])).all()
    assert (np.asarray(c_chk[:n_chk]) == np.asarray(c_ref[:n_ref])).all()


def test_build_with_chunking_matches():
    rng = np.random.default_rng(9)
    seqs = ["".join("ACGT"[i] for i in rng.integers(0, 4, size=60)) for _ in range(60)]
    b = encode_sequences(seqs)
    ref = build_dbg_from_reads(
        b.codes, b.lengths, k=23, add_reverse_complement=False,
        bucket_shapes=False, chunk_windows=0,
    )
    chunked = build_dbg_from_reads(
        b.codes, b.lengths, k=23, add_reverse_complement=False,
        bucket_shapes=False, chunk_windows=500,  # force many chunks
    )
    assert chunked.size == ref.size
    assert (np.asarray(chunked.kmers) == np.asarray(ref.kmers)).all()
    assert (np.asarray(chunked.mult) == np.asarray(ref.mult)).all()
    assert (np.asarray(chunked.out) == np.asarray(ref.out)).all()
    assert (np.asarray(chunked.in_) == np.asarray(ref.in_)).all()


def test_chunked_endpoints_match_single_pass():
    """The parted upload path must hand back the same per-row endpoint
    k-mers as the monolithic upload (tail padding rows excluded)."""
    rng = np.random.default_rng(5)
    seqs = [
        "".join("ACGT"[i] for i in rng.integers(0, 4, size=40))
        for _ in range(60)
    ]
    b = encode_sequences(seqs)
    eps_ref: dict = {}
    build_dbg_from_reads(
        b.codes, b.lengths, k=23, add_reverse_complement=True,
        bucket_shapes=False, chunk_windows=0, endpoints_out=eps_ref,
    )
    eps_chk: dict = {}
    build_dbg_from_reads(
        b.codes, b.lengths, k=23, add_reverse_complement=True,
        bucket_shapes=False, chunk_windows=500, endpoints_out=eps_chk,
    )
    R = b.num_reads
    for key in ("first_km", "last_km"):
        np.testing.assert_array_equal(
            np.asarray(eps_chk[key])[:R], np.asarray(eps_ref[key])[:R], key
        )
