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


def test_count_nodes_and_edges_matches_two_pass():
    """Derived node multiset (prefix-of-edge + last window) == direct count.

    Covers len<k (no windows), len==k (one k-window, no edges), len==k+1.
    """
    from mcaat_tpu.kmer.count import count_nodes_and_edges, count_unique

    rng = np.random.default_rng(7)
    k = 5
    lens = [3, k, k + 1, 9, 30, 17, k, 12, 25, 30]
    seqs = ["".join(rng.choice(list("ACGT"), size=n)) for n in lens]
    b = encode_sequences(seqs)
    codes, lengths = jnp.asarray(b.codes), jnp.asarray(b.lengths)

    km_k = extract_kmers(codes, lengths, k).reshape(-1)
    km_k1 = extract_kmers(codes, lengths, k + 1).reshape(-1)
    u_ref, c_ref, n_ref = count_unique(km_k)
    u1_ref, _, n1_ref = count_unique(km_k1)
    n_ref, n1_ref = int(n_ref), int(n1_ref)

    u, c, n, u1, n1 = count_nodes_and_edges(codes, lengths, k)
    assert int(n) == n_ref and int(n1) == n1_ref
    np.testing.assert_array_equal(np.asarray(u[:n_ref]), np.asarray(u_ref[:n_ref]))
    np.testing.assert_array_equal(np.asarray(c[:n_ref]), np.asarray(c_ref[:n_ref]))
    np.testing.assert_array_equal(np.asarray(u1[:n1_ref]), np.asarray(u1_ref[:n1_ref]))


def test_derive_nodes_from_edges_matches_direct_count():
    """Prefix-run derivation == direct k-window counting, and u_id == the
    source-endpoint lookup it replaces (``_lookup(u23, u24 >> 2)``).

    Covers len<k, len==k (node only via last window), len==k+1, and
    SENTINEL-padded (bucketed) edge/last tables.
    """
    from mcaat_tpu.graph.dbg import _lookup
    from mcaat_tpu.kmer.count import (
        count_edges_chunked,
        count_unique,
        derive_nodes_from_edges,
        extract_last_kmer,
    )

    rng = np.random.default_rng(21)
    k = 5
    lens = [3, k, k + 1, 9, 30, 17, k, 12, 25, 30, 30, 30]
    seqs = ["".join(rng.choice(list("ACGT"), size=n)) for n in lens]
    b = encode_sequences(seqs)
    codes, lengths = jnp.asarray(b.codes), jnp.asarray(b.lengths)

    km_k = extract_kmers(codes, lengths, k).reshape(-1)
    u_ref, c_ref, n_ref = count_unique(km_k)
    n_ref = int(n_ref)

    for chunked in (False, True):
        if chunked:
            u24, c24, n24 = count_edges_chunked(codes, lengths, k, chunk_rows=3)
        else:
            km1 = extract_kmers(codes, lengths, k + 1).reshape(-1)
            u24, c24, n24 = count_unique(km1)
        u_l, c_l, _n_l = count_unique(extract_last_kmer(codes, lengths, k))
        u23, c23, n23, u_id = derive_nodes_from_edges(
            u24, c24, jnp.int32(int(n24)), u_l, c_l
        )
        n23_i = int(n23)
        assert n23_i == n_ref
        np.testing.assert_array_equal(
            np.asarray(u23[:n_ref]), np.asarray(u_ref[:n_ref])
        )
        np.testing.assert_array_equal(
            np.asarray(c23[:n_ref]), np.asarray(c_ref[:n_ref])
        )
        # u_id == join of each unique edge's prefix against the node table
        n24_i = int(n24)
        pref = np.asarray(u24[:n24_i]) >> 2
        want = np.asarray(_lookup(u23[:n23_i], jnp.asarray(pref)))
        got = np.asarray(u_id[:n24_i])
        np.testing.assert_array_equal(got, want)
        assert (got >= 0).all()  # every prefix IS a node
        assert (np.asarray(u_id[n24_i:]) == -1).all()


def test_join_lookup2_matches_searchsorted():
    from mcaat_tpu.graph.dbg import _join_lookup2, _lookup

    rng = np.random.default_rng(11)
    table = np.unique(rng.integers(0, 1 << 46, size=500, dtype=np.int64))
    # pad table tail with SENTINEL (bucketed builds do this)
    table = np.concatenate([table, np.full(20, int(SENTINEL), np.int64)])
    q1 = rng.integers(0, 1 << 46, size=300, dtype=np.int64)
    q1[:100] = rng.choice(table[:-20], size=100)  # guaranteed hits
    q2 = rng.integers(0, 1 << 46, size=200, dtype=np.int64)
    q2[-5:] = int(SENTINEL)  # sentinel queries must miss
    t, q1, q2 = jnp.asarray(table), jnp.asarray(q1), jnp.asarray(q2)
    r1, r2 = _join_lookup2(t, q1, q2)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(_lookup(t, q1)))
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(_lookup(t, q2)))


def test_join_lookup2_boundaries():
    from mcaat_tpu.graph.dbg import _join_lookup2

    table = jnp.asarray(np.array([10, 20, 30], dtype=np.int64))
    q1 = jnp.asarray(np.array([5, 10, 30, 35, 20], dtype=np.int64))
    q2 = jnp.asarray(np.array([10, 10, 25], dtype=np.int64))
    r1, r2 = _join_lookup2(table, q1, q2)
    np.testing.assert_array_equal(np.asarray(r1), [-1, 0, 2, -1, 1])
    np.testing.assert_array_equal(np.asarray(r2), [0, 0, -1])
