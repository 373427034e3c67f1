"""Full-sharded pipeline vs single-device pipeline: identical output.

VERDICT r1 item 1's done-criterion: run_pipeline with the graph sharded
over the 8-virtual-CPU mesh must produce output identical to the
single-device run on synthetic fixtures (the golden fixture is covered
by test_golden.py, which also runs through the sharded path under the
test mesh).
"""

import numpy as np
import pytest

from mcaat_tpu.pipeline import run_pipeline
from mcaat_tpu.settings import Settings
from tests.synthetic import make_metagenome, write_fastq


def _run(tmp_path, meta, mesh, name):
    f1 = tmp_path / f"{name}.fq"
    write_fastq(str(f1), meta["reads"])
    s = Settings()
    s.input_files = str(f1)
    s.mesh = mesh
    s.output_file = str(tmp_path / f"report_{name}.txt")
    return run_pipeline(s, verbose=False)


@pytest.mark.slow
def test_sharded_pipeline_matches_single_device(tmp_path):
    meta = make_metagenome(seed=11, n_arrays=1, n_spacers=6, coverage=40.0)
    res_single = _run(tmp_path, meta, "off", "single")
    res_sharded = _run(tmp_path, meta, "auto", "sharded")
    assert res_sharded.report_text == res_single.report_text
    assert len(res_sharded.found_systems) == len(res_single.found_systems)
    for a, b in zip(res_sharded.found_systems, res_single.found_systems):
        assert a.full_sequence == b.full_sequence
        assert a.repeat == b.repeat
        assert a.spacers == b.spacers
        assert a.confidence_cycle_resolution == b.confidence_cycle_resolution
        assert a.confidence_topological_sort == b.confidence_topological_sort
    # same cycle structure (ids differ by layout; compare counts + lengths)
    assert len(res_sharded.cycles) == len(res_single.cycles)
    assert sorted(len(c) for c in res_sharded.cycles) == sorted(
        len(c) for c in res_single.cycles
    )
    assert len(res_sharded.reads) == len(res_single.reads)


@pytest.mark.slow
def test_sharded_pipeline_two_arrays(tmp_path):
    meta = make_metagenome(seed=23, n_arrays=2, n_spacers=5, coverage=40.0)
    res_single = _run(tmp_path, meta, "off", "single2")
    res_sharded = _run(tmp_path, meta, "auto", "sharded2")
    assert res_sharded.report_text == res_single.report_text
    assert len(res_sharded.found_systems) == len(res_single.found_systems)


def test_sharded_cycles_match_kmers(tmp_path):
    """Cycle node ids from the sharded search name the same k-mers as the
    single-device search (ids are layout-local; k-mer labels are not)."""
    from mcaat_tpu.graph.dbg import build_dbg_from_reads
    from mcaat_tpu.cycles.finder import find_cycles
    from mcaat_tpu.io.fastq import encode_sequences
    from mcaat_tpu.parallel.sharded_pipeline import (
        build_sharded_graph_for_pipeline,
        sharded_find_cycles,
    )

    meta = make_metagenome(seed=5, n_arrays=1, n_spacers=5, coverage=40.0)
    batch = encode_sequences(meta["reads"])
    s = Settings()
    sg = build_sharded_graph_for_pipeline(batch.codes, batch.lengths, s)
    assert sg is not None
    _valid, results_sharded = sharded_find_cycles(sg, verbose=False)

    g = build_dbg_from_reads(batch.codes, batch.lengths, k=23)
    _g2, results_single = find_cycles(g, verbose=False)

    km_sh = np.asarray(sg.kmers).reshape(-1)
    km_si = np.asarray(g.kmers)
    cyc_sh = sorted(
        tuple(int(km_sh[v]) for v in cyc)
        for cycles in results_sharded.values()
        for cyc in cycles
    )
    cyc_si = sorted(
        tuple(int(km_si[v]) for v in cyc)
        for cycles in results_single.values()
        for cyc in cycles
    )
    assert cyc_sh == cyc_si


def test_sharded_read_mapping_skewed_input(tmp_path):
    """Low-complexity reads route every window to one kp shard; the
    lookup must retry with doubled capacity instead of silently dropping
    (chains would quietly lose hits otherwise)."""
    from mcaat_tpu.parallel.sharded_pipeline import (
        build_sharded_graph_for_pipeline,
        sharded_get_reads,
    )
    from mcaat_tpu.graph.dbg import build_dbg_from_reads
    from mcaat_tpu.io.fastq import encode_sequences
    from mcaat_tpu.reads.mapper import get_reads
    from tests.synthetic import write_fastq

    # all-A reads: every 23-mer is AAAA... -> one owner shard
    reads = ["A" * 60] * 64 + ["ACGT" * 15] * 64
    fq = tmp_path / "skew.fq"
    write_fastq(str(fq), reads)
    batch = encode_sequences(reads)
    s = Settings()
    sg = build_sharded_graph_for_pipeline(batch.codes, batch.lengths, s)
    assert sg is not None
    g = build_dbg_from_reads(batch.codes, batch.lengths, k=23)
    # use every node as a "cycle node" so every read is kept
    import numpy as np

    km_sh = np.asarray(sg.kmers).reshape(-1)
    from mcaat_tpu.kmer.count import SENTINEL

    live = np.nonzero(km_sh != int(SENTINEL))[0]
    chains_sh = sharded_get_reads(sg, str(fq), None, [live.tolist()])
    live_si = np.arange(g.size)[np.asarray(g.valid)]
    chains_si = get_reads(g, str(fq), None, [live_si.tolist()])
    assert len(chains_sh) == len(chains_si)
    # same chains modulo the id layout: compare via k-mer labels
    km_si = np.asarray(g.kmers)

    def to_kmers(chains, km):
        return sorted(
            tuple(int(km[v]) if v >= 0 else -1 for v in ch) for ch in chains
        )

    assert to_kmers(chains_sh, km_sh) == to_kmers(chains_si, km_si)


def test_sharded_checkpoint_kill_and_resume(tmp_path):
    """Sharded-path checkpoint/resume (VERDICT r3 missing #5): the graph
    persists PER SHARD (no single-device compaction), a simulated crash
    after the cycle stage resumes from graph_sharded/ + cycles.json and
    reproduces the identical report, and the resumed graph is bit-equal
    to the built one."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from synthetic import make_metagenome, write_fastq

    import numpy as np

    from mcaat_tpu import checkpoint as ckpt
    from mcaat_tpu.parallel.sharded import make_pipeline_mesh
    from mcaat_tpu.pipeline import _run_pipeline_sharded
    from mcaat_tpu.settings import Settings

    meta = make_metagenome(seed=23, n_arrays=1, n_spacers=4, coverage=35.0)
    f = tmp_path / "r.fq"
    write_fastq(str(f), meta["reads"])
    ck = str(tmp_path / "ck")

    s = Settings(input_files=str(f), output_file=str(tmp_path / "a.txt"))
    r1 = _run_pipeline_sharded(s, verbose=False, checkpoint_dir=ck)
    assert r1 is not None and r1.report_text
    assert os.path.exists(os.path.join(ck, "graph_sharded", "meta.json"))
    assert os.path.exists(os.path.join(ck, "cycles.json"))
    assert os.path.exists(os.path.join(ck, "valid_pruned", "meta.json"))
    assert os.path.exists(os.path.join(ck, "reads.json"))

    # the persisted graph round-trips bit-exactly per shard
    mesh = make_pipeline_mesh()
    sg2 = ckpt.load_sharded_graph(os.path.join(ck, "graph_sharded"), mesh)
    assert sg2.shard_capacity > 0 and sg2.n_live is not None

    # simulated crash after the cycle stage: reads/report artifacts gone
    os.remove(os.path.join(ck, "reads.json"))
    s2 = Settings(input_files=str(f), output_file=str(tmp_path / "b.txt"))
    r2 = _run_pipeline_sharded(s2, verbose=False, checkpoint_dir=ck)
    assert r2.report_text == r1.report_text
    assert len(r2.reads) == len(r1.reads)
    assert [c for c in r2.cycles] == [c for c in r1.cycles]

    # full resume (everything checkpointed) also reproduces the report
    s3 = Settings(input_files=str(f), output_file=str(tmp_path / "c.txt"))
    r3 = _run_pipeline_sharded(s3, verbose=False, checkpoint_dir=ck)
    assert r3.report_text == r1.report_text


def test_sharded_lazy_path_matches_single_device(tmp_path, monkeypatch):
    """At >= LAZY_CLIP_MIN_NODES the sharded pipeline defers the tip clip
    (no chain collapse, no O(N) collectives); with the threshold forced
    low, the sharded lazy path must still match the single-device run
    (which makes the same lazy choice at the same threshold)."""
    from mcaat_tpu.cycles import finder as _finder

    monkeypatch.setattr(_finder, "LAZY_CLIP_MIN_NODES", 1)
    # keep the assertion invariant LAZY >= NEIGHBORHOOD intact
    monkeypatch.setattr(_finder, "NEIGHBORHOOD_MIN_NODES", 1)
    meta = make_metagenome(seed=41, n_arrays=2, n_spacers=5, coverage=40.0)
    res_single = _run(tmp_path, meta, "off", "lazy_single")
    res_sharded = _run(tmp_path, meta, "auto", "lazy_sharded")
    assert res_sharded.report_text == res_single.report_text
    assert len(res_sharded.found_systems) == len(res_single.found_systems)
    for a, b in zip(res_sharded.found_systems, res_single.found_systems):
        assert a.full_sequence == b.full_sequence
        assert a.spacers == b.spacers


def test_sharded_candidate_ids_matches_mask():
    """The per-shard two-stage candidate scan must equal the full-graph
    candidate mask (same predicate, candidate-proportional downloads)."""
    import jax.numpy as jnp

    from mcaat_tpu.cycles.start_nodes import _candidate_mask
    from mcaat_tpu.io.fastq import encode_sequences
    from mcaat_tpu.parallel.sharded_graph import (
        _vmult_filter,
        sharded_candidate_ids,
        tagged_adjacency,
    )
    from mcaat_tpu.parallel.sharded_pipeline import (
        build_sharded_graph_for_pipeline,
    )
    from mcaat_tpu.settings import Settings

    meta = make_metagenome(seed=7, n_arrays=1, n_spacers=4, coverage=35.0)
    batch = encode_sequences(meta["reads"])
    sg = build_sharded_graph_for_pipeline(batch.codes, batch.lengths, Settings())
    assert sg is not None
    valid0 = _vmult_filter(sg.valid, sg.mult)
    outv, inv = tagged_adjacency(sg, valid0)
    for thr in (0, 20):
        got = sharded_candidate_ids(sg, valid0, outv, inv, thr)
        want_mask = _candidate_mask(
            sg.out.reshape(-1),
            sg.in_.reshape(-1),
            valid0.reshape(-1),
            sg.mult.reshape(-1),
            thr,
        )
        want = np.nonzero(np.asarray(want_mask))[0]
        np.testing.assert_array_equal(got, want)
