"""Multi-device sharding tests on the 8-virtual-CPU-device mesh
(SURVEY §4: distributed tests on a simulated mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcaat_tpu.io.fastq import encode_sequences
from mcaat_tpu.kmer.count import SENTINEL, count_kmers_for_reads
from mcaat_tpu.parallel.sharded import (
    make_pipeline_mesh,
    sharded_count_kmers,
    sharded_lookup,
    sharded_pipeline_step,
)


def make_reads(n=32, length=40, seed=0):
    rng = np.random.default_rng(seed)
    seqs = ["".join("ACGT"[i] for i in rng.integers(0, 4, size=length)) for _ in range(n)]
    return seqs, encode_sequences(seqs)


def test_mesh_shape():
    mesh = make_pipeline_mesh()
    assert mesh.shape["dp"] * mesh.shape["kp"] == len(jax.devices())
    assert mesh.shape["kp"] & (mesh.shape["kp"] - 1) == 0


@pytest.mark.parametrize("dp", [1, 2])
def test_sharded_count_matches_single_device(dp):
    seqs, batch = make_reads(n=16, length=40)
    k = 11
    mesh = make_pipeline_mesh(dp=dp)
    unique, counts, dropped = sharded_count_kmers(
        mesh, jnp.asarray(batch.codes), jnp.asarray(batch.lengths), k,
        route_cap=1 << 10, unique_cap=1 << 10,
    )
    assert int(dropped) == 0
    u = np.asarray(unique)
    c = np.asarray(counts)
    live = u != int(SENTINEL)
    got = dict(zip(u[live].tolist(), c[live].tolist()))
    ref_u, ref_c = count_kmers_for_reads(batch.codes, batch.lengths, k)
    expected = dict(zip(ref_u.tolist(), ref_c.tolist()))
    assert got == expected


def test_sharded_lookup_roundtrip():
    seqs, batch = make_reads(n=16, length=40, seed=3)
    k = 11
    mesh = make_pipeline_mesh()
    unique, counts, _ = sharded_count_kmers(
        mesh, jnp.asarray(batch.codes), jnp.asarray(batch.lengths), k,
        route_cap=1 << 10, unique_cap=1 << 10,
    )
    # queries: all true k-mers (must hit) + some absent ones (must miss)
    ref_u, _ = count_kmers_for_reads(batch.codes, batch.lengths, k)
    kp = mesh.shape["kp"]
    T = unique.shape[0] // kp
    n_q = 64
    queries = np.full(n_q, int(SENTINEL), dtype=np.int64)
    queries[: len(ref_u[:48])] = ref_u[:48]
    queries[48] = 0  # likely-absent k-mer (AAAA...A)
    idx, dropped = sharded_lookup(mesh, unique, jnp.asarray(queries), k,
                                  route_cap=1 << 10)
    assert int(dropped) == 0
    idx = np.asarray(idx)
    u_host = np.asarray(unique).reshape(kp, T)
    for qi, q in enumerate(queries):
        if q == int(SENTINEL):
            assert idx[qi] == -1
            continue
        owner = int(q) >> (2 * k - (kp.bit_length() - 1))
        if q in u_host[owner]:
            assert u_host[owner][idx[qi]] == q
        else:
            assert idx[qi] == -1


def test_sharded_pipeline_step_stats():
    seqs, batch = make_reads(n=8, length=40, seed=7)
    k = 11
    mesh = make_pipeline_mesh()
    stats = sharded_pipeline_step(
        mesh, jnp.asarray(batch.codes), jnp.asarray(batch.lengths), k,
        route_cap=1 << 10, unique_cap=1 << 10,
    )
    ref_u, ref_c = count_kmers_for_reads(batch.codes, batch.lengths, k)
    assert int(stats["dropped"]) == 0
    assert int(stats["n_unique"]) == len(ref_u)
    assert int(stats["total_mult"]) == int(ref_c.sum())
    # every real k-mer window must hit the sharded table
    n_windows = int(np.maximum(batch.lengths - k + 1, 0).sum())
    assert int(stats["n_hit"]) == n_windows
