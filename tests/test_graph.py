"""Graph build/query tests vs a dict-based model dBG (SURVEY §4 strategy)."""

import numpy as np
import jax.numpy as jnp

from mcaat_tpu.io.fastq import encode_kmer, encode_sequences, reverse_complement
from mcaat_tpu.graph.dbg import build_dbg_from_reads


def model_dbg(seqs: list[str], k: int):
    """Naive dict-based de Bruijn graph."""
    from collections import Counter

    nodes = Counter()
    edges = set()
    for s in seqs:
        for i in range(len(s) - k + 1):
            nodes[s[i : i + k]] += 1
        for i in range(len(s) - k):
            edges.add(s[i : i + k + 1])
    return nodes, edges


def test_build_matches_model():
    rng = np.random.default_rng(7)
    seqs = ["".join("ACGT"[i] for i in rng.integers(0, 4, size=80)) for _ in range(20)]
    k = 23
    batch = encode_sequences(seqs)
    g = build_dbg_from_reads(batch.codes, batch.lengths, k=k, add_reverse_complement=False, bucket_shapes=False)
    nodes, edges = model_dbg(seqs, k)

    assert g.size == len(nodes)
    # multiplicities
    table = np.asarray(g.kmers)
    mult = np.asarray(g.mult)
    for km, cnt in nodes.items():
        idx = np.searchsorted(table, encode_kmer(km))
        assert table[idx] == encode_kmer(km)
        assert mult[idx] == cnt
    # adjacency matches the (k+1)-mer edge set exactly
    out = np.asarray(g.out).reshape(-1, 4)
    ids = {km: int(np.searchsorted(table, encode_kmer(km))) for km in nodes}
    for km in nodes:
        u = ids[km]
        for b_i, b in enumerate("ACGT"):
            e = km + b
            v_km = e[1:]
            if e in edges:
                assert out[u, b_i] == ids[v_km], (km, b)
            else:
                assert out[u, b_i] == -1


def test_build_engines_identical():
    """inst (instance-scatter) and join (fused sort-join) build the same graph."""
    rng = np.random.default_rng(11)
    seqs = [
        "".join("ACGT"[i] for i in rng.integers(0, 4, size=rng.integers(20, 90)))
        for _ in range(40)
    ]
    # duplicates force multiplicity > 1 and repeated edges
    seqs += seqs[:10]
    batch = encode_sequences(seqs)
    for rc in (False, True):
        for bucket in (False, True):
            a = build_dbg_from_reads(
                batch.codes, batch.lengths, k=23,
                add_reverse_complement=rc, bucket_shapes=bucket, engine="inst",
            )
            b = build_dbg_from_reads(
                batch.codes, batch.lengths, k=23,
                add_reverse_complement=rc, bucket_shapes=bucket, engine="join",
            )
            assert a.size == b.size
            n = int(np.sum(np.asarray(a.valid)))
            assert n == int(np.sum(np.asarray(b.valid)))
            np.testing.assert_array_equal(np.asarray(a.kmers)[:n], np.asarray(b.kmers)[:n])
            np.testing.assert_array_equal(np.asarray(a.mult)[:n], np.asarray(b.mult)[:n])
            np.testing.assert_array_equal(
                np.asarray(a.out)[: 4 * n], np.asarray(b.out)[: 4 * n]
            )
            np.testing.assert_array_equal(
                np.asarray(a.in_)[: 4 * n], np.asarray(b.in_)[: 4 * n]
            )


def test_rc_strand_included():
    seq = "ACGTTGCAACGGTCCAGTTTACGCATCGAT"
    batch = encode_sequences([seq])
    g = build_dbg_from_reads(batch.codes, batch.lengths, k=23, add_reverse_complement=True)
    rc = reverse_complement(seq)
    q = jnp.array(
        [encode_kmer(seq[:23]), encode_kmer(rc[:23])], dtype=jnp.int64
    )
    ids = np.asarray(g.lookup(q))
    assert (ids >= 0).all()


def test_bucketed_build_equivalent():
    """Bucket-padded build: padded tail is invalid and query-inert."""
    rng = np.random.default_rng(3)
    seqs = ["".join("ACGT"[i] for i in rng.integers(0, 4, size=60)) for _ in range(10)]
    batch = encode_sequences(seqs)
    exact = build_dbg_from_reads(
        batch.codes, batch.lengths, k=23, add_reverse_complement=False,
        bucket_shapes=False,
    )
    padded = build_dbg_from_reads(
        batch.codes, batch.lengths, k=23, add_reverse_complement=False,
        bucket_shapes=True,
    )
    n = exact.size
    assert padded.size >= n
    assert (np.asarray(padded.kmers[:n]) == np.asarray(exact.kmers)).all()
    assert (np.asarray(padded.out[: 4 * n]) == np.asarray(exact.out)).all()
    assert (np.asarray(padded.mult[:n]) == np.asarray(exact.mult)).all()
    assert not np.asarray(padded.valid[n:]).any()
    # padded-tail SENTINEL entries never match lookups
    from mcaat_tpu.kmer.count import SENTINEL
    ids = np.asarray(padded.lookup(jnp.array([SENTINEL], dtype=jnp.int64)))
    assert ids[0] == -1
    # degrees agree on the live prefix
    assert (
        np.asarray(padded.out_degree()[:n]) == np.asarray(exact.out_degree())
    ).all()


def test_lookup_miss_returns_minus1():
    batch = encode_sequences(["ACGTACGTTGCAACGGTCCAGTTTACG"])
    g = build_dbg_from_reads(batch.codes, batch.lengths, k=23, add_reverse_complement=False, bucket_shapes=False)
    missing = encode_kmer("A" * 23)
    ids = np.asarray(g.lookup(jnp.array([missing], dtype=jnp.int64)))
    assert ids[0] == -1


def test_degrees_validity_aware():
    # path: AAAC -> AACG -> ACGT with k=4... use k=23-style but tiny via
    # direct build: simplest is a long unique sequence (path graph).
    seq = "ACGTTGCAACGGTCCAGTTTACGCATCGATT"
    batch = encode_sequences([seq])
    g = build_dbg_from_reads(batch.codes, batch.lengths, k=23, add_reverse_complement=False, bucket_shapes=False)
    outdeg = np.asarray(g.out_degree())
    indeg = np.asarray(g.in_degree())
    # path graph: one source, one sink
    assert (outdeg <= 1).all() and (indeg <= 1).all()
    assert (outdeg == 0).sum() == 1 and (indeg == 0).sum() == 1
    # invalidate the sink's predecessor -> predecessor's predecessor outdeg drops
    sink = int(np.nonzero(outdeg == 0)[0][0])
    pred = int(np.asarray(g.in_).reshape(-1, 4)[sink].max())
    g2 = g.set_invalid(np.arange(g.size) == pred)
    outdeg2 = np.asarray(g2.out_degree())
    pred2 = int(np.asarray(g.in_).reshape(-1, 4)[pred].max())
    assert outdeg2[pred2] == 0


def test_build_adjacency_chunked_matches_single_shot():
    import jax.numpy as jnp

    from mcaat_tpu.graph.dbg import (
        _build_adjacency,
        build_adjacency_chunked,
    )
    from mcaat_tpu.kmer.count import count_unique, extract_kmers
    from mcaat_tpu.io.fastq import encode_sequences

    rng = np.random.default_rng(3)
    seqs = ["".join(rng.choice(list("ACGT"), size=60)) for _ in range(40)]
    b = encode_sequences(seqs)
    k = 7
    km_k = extract_kmers(jnp.asarray(b.codes), jnp.asarray(b.lengths), k).reshape(-1)
    km_k1 = extract_kmers(jnp.asarray(b.codes), jnp.asarray(b.lengths), k + 1).reshape(-1)
    u_k, _, n_k = count_unique(km_k)
    u_k1, _, n_k1 = count_unique(km_k1)
    n_k_i, n_k1_i = int(n_k), int(n_k1)
    u_k = u_k[:n_k_i]
    out_ref, in_ref = _build_adjacency(u_k, u_k1, n_k1, k=k)
    out_c, in_c = build_adjacency_chunked(
        u_k, u_k1[:n_k1_i], n_k1_i, k=k, chunk_edges=257
    )
    np.testing.assert_array_equal(np.asarray(out_c), np.asarray(out_ref))
    np.testing.assert_array_equal(np.asarray(in_c), np.asarray(in_ref))


def test_bucket_size_ladder():
    """Fine {1, 1.25, 1.5, 1.75} x pow2 tiers below the 64M-row coarse
    threshold, {1, 1.5} x pow2 above it (fewer tiers -> cross-dataset
    compiled-shape reuse; ARCHITECTURE.md 'Compile ladder')."""
    from mcaat_tpu.graph.dbg import _COARSE_BUCKET_MIN, _bucket_size

    assert _COARSE_BUCKET_MIN == 64 * 1024 * 1024  # default env
    # fine tiers below the threshold
    assert _bucket_size(1_100_000) == 1_310_720  # 1.25 x 2^20
    assert _bucket_size(1_400_000) == 1_572_864  # 1.5 x 2^20
    assert _bucket_size(1_900_000) == 2_097_152  # 2 x 2^20
    assert _bucket_size(1024) == 1024
    assert _bucket_size(1025) == 1280
    # coarse tiers above: the 1.25/1.75 steps vanish
    assert _bucket_size(70_000_000) == 100_663_296  # 1.5 x 2^26 (fine: 83.9M)
    assert _bucket_size(110_000_000) == 134_217_728  # 2 x 2^26 (fine: 117.4M)
    # the r3/r4 artifact shapes are tier-stable across the ladder change
    assert _bucket_size(100_663_296) == 100_663_296
    assert _bucket_size(124_506_334) == 134_217_728
    # buckets are always >= n (no silent truncation anywhere)
    for n in (3, 999, 4097, 67_108_865, 200_000_000):
        assert _bucket_size(n) >= n


def test_trusted_join_matches_verified():
    """_join_lookup1_trusted == _join_lookup1 for in-table queries (the
    adjacency's suffix-closure case), including SENTINEL-padded tables
    and SENTINEL queries (VERDICT r4 #6)."""
    import jax.numpy as jnp
    import numpy as np

    from mcaat_tpu.graph.dbg import _join_lookup1, _join_lookup1_trusted
    from mcaat_tpu.kmer.count import SENTINEL

    rng = np.random.default_rng(3)
    table_live = np.unique(rng.integers(0, 1 << 46, size=5000, dtype=np.int64))
    pad = np.full(1000, np.int64(SENTINEL))
    table = jnp.asarray(np.concatenate([table_live, pad]))
    q_real = rng.choice(table_live, size=8192, replace=True)
    q = np.concatenate([q_real, np.full(512, np.int64(SENTINEL))])
    got = np.asarray(_join_lookup1_trusted(table, jnp.asarray(q)))
    want = np.asarray(_join_lookup1(table, jnp.asarray(q)))
    np.testing.assert_array_equal(got, want)


def test_build_adjacency_trusted_matches_verified(monkeypatch):
    """The full adjacency with the trusted join equals MCAAT_VERIFY_ADJ=1
    on a real build (env checked at trace time, so clear jit caches)."""
    import os

    import jax
    import numpy as np

    from mcaat_tpu.graph.dbg import build_dbg_from_reads
    from mcaat_tpu.io.fastq import encode_sequences

    rng = np.random.default_rng(11)
    seqs = ["".join(rng.choice(list("ACGT"), size=70)) for _ in range(48)]
    b = encode_sequences(seqs)

    g1 = build_dbg_from_reads(b.codes, b.lengths, k=23)
    monkeypatch.setenv("MCAAT_VERIFY_ADJ", "1")
    jax.clear_caches()
    g2 = build_dbg_from_reads(b.codes, b.lengths, k=23)
    jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(g1.out), np.asarray(g2.out))
    np.testing.assert_array_equal(np.asarray(g1.in_), np.asarray(g2.in_))
