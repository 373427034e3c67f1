"""Distributed graph build + frontier exchange vs the single-device graph."""

import jax.numpy as jnp
import numpy as np
import pytest

from mcaat_tpu.graph.dbg import build_dbg_from_reads
from mcaat_tpu.io.fastq import encode_sequences
from mcaat_tpu.kmer.count import SENTINEL
from mcaat_tpu.parallel.sharded import make_pipeline_mesh
from mcaat_tpu.parallel.sharded_graph import (
    build_sharded_dbg,
    frontier_step,
    tag_adjacency,
)


def make_reads(n=32, length=60, seed=0):
    rng = np.random.default_rng(seed)
    seqs = ["".join("ACGT"[i] for i in rng.integers(0, 4, size=length)) for _ in range(n)]
    return encode_sequences(seqs)


def test_sharded_build_matches_single_device():
    batch = make_reads(n=16, length=60, seed=1)
    k = 11
    mesh = make_pipeline_mesh()
    sg, dropped = build_sharded_dbg(mesh, batch.codes, batch.lengths, k=k)
    assert dropped == 0
    ref = build_dbg_from_reads(
        batch.codes, batch.lengths, k=k, add_reverse_complement=False,
        bucket_shapes=False,
    )

    g_kmers, g_mult, g_out, g_valid, g_in = sg.to_single_device()
    live = g_kmers != int(SENTINEL)
    # same node set + multiplicities
    ref_kmers = np.asarray(ref.kmers)
    ref_mult = np.asarray(ref.mult)
    got = dict(zip(g_kmers[live].tolist(), g_mult[live].tolist()))
    assert got == dict(zip(ref_kmers.tolist(), ref_mult.tolist()))

    # same edges: map global ids -> kmers and compare edge sets
    ref_out = np.asarray(ref.out).reshape(-1, 4)
    ref_edges = set()
    for u in range(ref.size):
        for b in range(4):
            v = ref_out[u, b]
            if v >= 0:
                ref_edges.add((int(ref_kmers[u]), b, int(ref_kmers[v])))
    got_edges = set()
    for gid in np.nonzero(live)[0]:
        for b in range(4):
            v = g_out[gid, b]
            if v >= 0:
                got_edges.add((int(g_kmers[gid]), b, int(g_kmers[v])))
    assert got_edges == ref_edges

    # in-adjacency mirrors out-adjacency: u--(b)-->v iff v's in-list at
    # first-base(u) is u
    in_edges = set()
    for gid in np.nonzero(live)[0]:
        for fb in range(4):
            u = g_in[gid, fb]
            if u >= 0:
                # reconstruct the out base: v's kmer last base
                b = int(g_kmers[gid]) & 3
                in_edges.add((int(g_kmers[u]), b, int(g_kmers[gid])))
    assert in_edges == ref_edges


def test_sharded_prune_and_candidates():
    """Distributed prune must match the single-device prune + scan."""
    import jax.numpy as jnp

    from mcaat_tpu.parallel.sharded_graph import sharded_prune_and_candidates
    from mcaat_tpu.prune.prune import prune_graph

    batch = make_reads(n=16, length=60, seed=2)
    k = 11
    mesh = make_pipeline_mesh()
    sg, _ = build_sharded_dbg(mesh, batch.codes, batch.lengths, k=k)
    v2, cand = sharded_prune_and_candidates(
        mesh, sg.mult, sg.out, sg.in_, sg.valid, threshold_multiplicity=0
    )
    g_kmers, g_mult, g_out, _gv, _gi = sg.to_single_device()
    v2_flat = np.asarray(v2).reshape(-1)

    ref = build_dbg_from_reads(
        batch.codes, batch.lengths, k=k, add_reverse_complement=False,
        bucket_shapes=False,
    )
    ref_pruned = prune_graph(ref, verbose=False)
    ref_valid = {
        int(km): bool(val)
        for km, val in zip(np.asarray(ref.kmers), np.asarray(ref_pruned.valid))
    }
    live = g_kmers != int(SENTINEL)
    for gid in np.nonzero(live)[0]:
        assert bool(v2_flat[gid]) == ref_valid[int(g_kmers[gid])], gid


def test_frontier_step_expands_correctly():
    batch = make_reads(n=8, length=50, seed=3)
    k = 11
    mesh = make_pipeline_mesh()
    sg, _ = build_sharded_dbg(mesh, batch.codes, batch.lengths, k=k)
    g_kmers, _m, g_out, g_valid, _gi = sg.to_single_device()
    live_ids = np.nonzero(g_kmers != int(SENTINEL))[0][:16].astype(np.int32)
    Q = 32
    frontier = np.full(Q, -1, dtype=np.int32)
    frontier[: len(live_ids)] = live_ids
    outv = tag_adjacency(mesh, sg.out, sg.valid)
    nbrs = np.asarray(
        frontier_step(mesh, outv, jnp.asarray(frontier), route_cap=1 << 8)
    )
    for qi in range(Q):
        gid = frontier[qi]
        if gid < 0:
            assert (nbrs[qi] == -1).all()
            continue
        # untagged (>= 0) entries are exactly the valid out-neighbors
        expected = set(int(v) for v in g_out[gid] if v >= 0 and g_valid[v])
        got = set(int(v) for v in nbrs[qi] if v >= 0)
        assert got == expected
        # tagged entries (-2-gid) decode to the invalid out-neighbors
        expected_inv = set(int(v) for v in g_out[gid] if v >= 0 and not g_valid[v])
        got_inv = set(int(-2 - v) for v in nbrs[qi] if v <= -2)
        assert got_inv == expected_inv


def test_tag_adjacency_roundtrip():
    """Tags must encode exactly the target validity and decode to the
    original adjacency."""
    from mcaat_tpu.parallel.sharded_graph import decode_tagged

    batch = make_reads(n=8, length=50, seed=5)
    mesh = make_pipeline_mesh()
    sg, _ = build_sharded_dbg(mesh, batch.codes, batch.lengths, k=11)
    kp, T = sg.kmers.shape
    # invalidate an arbitrary subset so both tag states occur
    valid_h = np.asarray(sg.valid).copy()
    rng = np.random.default_rng(0)
    live = np.nonzero(valid_h.reshape(-1))[0]
    kill = rng.choice(live, size=max(len(live) // 3, 1), replace=False)
    valid_h.reshape(-1)[kill] = False
    valid = jnp.asarray(valid_h)

    outv = np.asarray(tag_adjacency(mesh, sg.out, valid))
    raw = np.asarray(sg.out)
    dec = np.asarray(decode_tagged(jnp.asarray(outv)))
    np.testing.assert_array_equal(dec, raw)
    vflat = valid_h.reshape(-1)
    ent = raw.reshape(-1)
    tag = outv.reshape(-1)
    present = ent >= 0
    np.testing.assert_array_equal(
        tag[present] >= 0, vflat[ent[present]]
    )
    assert (tag[~present] == -1).all()


def test_pipeline_sharded_build_matches_single_device():
    """The --mesh auto pipeline branch == single-device build (live rows)."""
    import jax

    from mcaat_tpu.graph.dbg import build_dbg_from_reads
    from mcaat_tpu.io.fastq import encode_sequences
    from mcaat_tpu.pipeline import _build_graph_sharded
    from mcaat_tpu.settings import Settings

    rng = np.random.default_rng(17)
    seqs = ["".join(rng.choice(list("ACGT"), size=60)) for _ in range(33)]
    b = encode_sequences(seqs)

    ref = build_dbg_from_reads(b.codes, b.lengths, k=23, add_reverse_complement=True)
    n = int(np.asarray(ref.valid).sum())
    got = _build_graph_sharded(b.codes, b.lengths, Settings())
    assert got is not None
    assert got.size == n
    live = np.asarray(ref.valid)
    np.testing.assert_array_equal(np.asarray(got.kmers), np.asarray(ref.kmers)[live])
    np.testing.assert_array_equal(np.asarray(got.mult), np.asarray(ref.mult)[live])
    # adjacency ids in ref point into the padded table; live prefix ids match
    np.testing.assert_array_equal(np.asarray(got.out).reshape(-1, 4), np.asarray(ref.out).reshape(-1, 4)[live])
    np.testing.assert_array_equal(np.asarray(got.in_).reshape(-1, 4), np.asarray(ref.in_).reshape(-1, 4)[live])


def test_sharded_build_parted_counting_matches():
    """Chunked distributed counting (VERDICT r3 missing #2): force the
    per-part budget far below the dataset so the per-shard merge stack
    reduces many part tables, and require exact graph equality with the
    unparted build — and a node-proportional capacity."""
    batch = make_reads(n=48, length=60, seed=7)
    k = 11
    mesh = make_pipeline_mesh()
    # budget of 1 count row/shard -> rows_per_part clamps to the minimum
    # (one read row per device) -> ~48/8 parts through the merge stack
    sg_p, dropped_p = build_sharded_dbg(
        mesh, batch.codes, batch.lengths, k=k, count_shard_rows=1
    )
    assert dropped_p == 0
    sg_1, dropped_1 = build_sharded_dbg(mesh, batch.codes, batch.lengths, k=k)
    assert dropped_1 == 0

    kp_, mp_, op_, vp_, ip_ = sg_p.to_single_device()
    k1_, m1_, o1_, v1_, i1_ = sg_1.to_single_device()
    live_p = kp_ != int(SENTINEL)
    live_1 = k1_ != int(SENTINEL)
    assert dict(zip(kp_[live_p].tolist(), mp_[live_p].tolist())) == dict(
        zip(k1_[live_1].tolist(), m1_[live_1].tolist())
    )

    def edge_set(km, out, live):
        es = set()
        for gid in np.nonzero(live)[0]:
            for b in range(4):
                v = out[gid, b]
                if v >= 0:
                    es.add((int(km[gid]), b, int(km[v])))
        return es

    assert edge_set(kp_, op_, live_p) == edge_set(k1_, o1_, live_1)
    assert edge_set(kp_, ip_, live_p) == edge_set(k1_, i1_, live_1)

    # capacity sized from counted LIVE rows, never from windows
    for sg in (sg_p, sg_1):
        assert sg.n_live is not None
        assert sg.shard_capacity <= max(2 * int(sg.n_live.max()), 1024), (
            sg.shard_capacity,
            sg.n_live,
        )


def test_sharded_build_rc_bitmath_matches_rc_rows():
    """add_rc=True (RC as packed-k-mer bit math, no RC code matrix) must
    equal the single-device build over explicit RC rows."""
    batch = make_reads(n=12, length=50, seed=9)
    k = 11
    mesh = make_pipeline_mesh()
    sg, dropped = build_sharded_dbg(
        mesh, batch.codes, batch.lengths, k=k, add_rc=True
    )
    assert dropped == 0
    ref = build_dbg_from_reads(
        batch.codes, batch.lengths, k=k, add_reverse_complement=True,
        bucket_shapes=False,
    )
    g_kmers, g_mult, _o, _v, _i = sg.to_single_device()
    live = g_kmers != int(SENTINEL)
    ref_live = np.asarray(ref.valid)
    assert dict(zip(g_kmers[live].tolist(), g_mult[live].tolist())) == dict(
        zip(
            np.asarray(ref.kmers)[ref_live].tolist(),
            np.asarray(ref.mult)[ref_live].tolist(),
        )
    )
