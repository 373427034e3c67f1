"""Spacer-ordering tests. The set-cover cases mirror the reference's unit
tests (tests/test_spacer_ordering.cpp:11-107); the rest cover SCC,
constraints, MST, and the heuristic toposort."""

import numpy as np

from mcaat_tpu.ordering.ordering import (
    NOT_IN_ANY_CYCLE_INDEX,
    Subgraph,
    divide_graph_into_subgraphs,
    every_possible_combination,
    find_strongly_connected_components,
    generate_constraints_from_read,
    generate_out_of_cycles_constraints_from_read,
    get_maximal_spanning_tree,
    get_minimum_cycles_for_full_coverage,
    get_node_to_unique_cycle_map,
    get_ordered_cycles,
    order_cycles,
    solve_min_cover_problem,
)


# ---- set cover (parity with tests/test_spacer_ordering.cpp) ---------------


def test_min_cover_empty():
    assert solve_min_cover_problem(set(), []) == []
    assert solve_min_cover_problem({0, 1}, []) == []


def test_min_cover_singleton():
    assert solve_min_cover_problem({0}, [[0]]) == [0]


def test_min_cover_optimal_two():
    universe = {0, 1, 2, 3}
    sets = [[0, 1], [2, 3], [0], [1], [2]]
    result = solve_min_cover_problem(universe, sets)
    covered = set()
    for i in result:
        covered.update(sets[i])
    assert covered == universe
    assert len(result) == 2


def test_min_cover_redundant_supersets():
    universe = {0, 1, 2}
    sets = [[0, 1, 2], [0, 1], [1, 2], [0]]
    result = solve_min_cover_problem(universe, sets)
    assert result == [0]


def test_min_cover_complex_overlap():
    universe = set(range(6))
    sets = [[0, 1, 2], [2, 3], [3, 4, 5], [0, 5], [1, 4]]
    result = solve_min_cover_problem(universe, sets)
    covered = set()
    for i in result:
        covered.update(sets[i])
    assert covered == universe
    assert len(result) <= 3


def test_minimum_cycles_for_full_coverage_dedups():
    cycles = [[1, 2, 3], [1, 2, 3], [4, 5]]
    kept = get_minimum_cycles_for_full_coverage(cycles)
    assert len(kept) == 2
    assert [4, 5] in kept


# ---- SCC ------------------------------------------------------------------


def adj_matrix(edges: dict[int, list[int]], n: int) -> np.ndarray:
    out = np.full((n, 4), -1, dtype=np.int32)
    for u, vs in edges.items():
        for i, v in enumerate(vs):
            out[u, i] = v
    return out


def test_scc_two_components():
    # two 3-cycles joined by a one-way bridge + a stray path node
    edges = {0: [1], 1: [2], 2: [0, 3], 3: [4], 4: [5], 5: [3], 6: [0]}
    out = adj_matrix(edges, 7)
    valid = np.ones(7, bool)
    comps = find_strongly_connected_components(out, valid)
    comp_sets = sorted(tuple(sorted(c)) for c in comps)
    assert comp_sets == [(0, 1, 2), (3, 4, 5)]


def test_scc_respects_validity():
    edges = {0: [1], 1: [2], 2: [0]}
    out = adj_matrix(edges, 3)
    valid = np.array([True, False, True])
    comps = find_strongly_connected_components(out, valid)
    assert comps == []


def test_divide_graph_into_subgraphs():
    edges = {0: [1], 1: [2], 2: [0, 3], 3: [4], 4: [5], 5: [3]}
    out = adj_matrix(edges, 6)
    sgs = divide_graph_into_subgraphs(out, np.ones(6, bool))
    assert len(sgs) == 2
    node_sets = sorted(tuple(sorted(sg.nodes)) for sg in sgs)
    assert node_sets == [(0, 1, 2), (3, 4, 5)]
    for sg in sgs:
        # bridge edge 2->3 must not be present
        assert all(v in sg.nodes for vs in sg.adjacency.values() for v in vs)


def test_native_scc_parity(monkeypatch):
    """The native Tarjan (mcaat_scc) must be result- AND order-identical
    to the Python fallback — component emission order and intra-component
    (stack-pop) node order both feed deterministic downstream iteration."""
    import pytest

    from mcaat_tpu.native import scc_components

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(5, 200))
        out = np.full((n, 4), -1, dtype=np.int32)
        for u in range(n):
            deg = int(rng.integers(0, 4))
            out[u, :deg] = rng.integers(0, n, size=deg)
        valid = rng.random(n) > 0.15
        from mcaat_tpu.ordering.ordering import _valid_csr

        indptr, indices = _valid_csr(out, valid)
        native = scc_components(indptr, indices, valid)
        if native is None:
            pytest.skip("native lib not built")
        import mcaat_tpu.ordering.ordering as mod

        monkeypatch.setattr(
            "mcaat_tpu.native.scc_components", lambda *a: None
        )
        python = mod.find_strongly_connected_components(out, valid)
        monkeypatch.undo()
        assert native == python, f"trial {trial}"


# ---- constraints ----------------------------------------------------------


def test_every_possible_combination_unmerged_quirk():
    # the reference feeds the unmerged list -> repeated pairs act as weights
    v = [0, 0, 1]
    assert every_possible_combination(v) == [(0, 1), (0, 1)]


def test_generate_constraints_from_read():
    n2c = {10: 0, 11: 0, 20: 1, 30: 2}
    read = [10, 11, 99, 20, 30]
    cons = generate_constraints_from_read(read, n2c)
    assert cons.count((0, 1)) == 2
    assert cons.count((0, 2)) == 2
    assert cons.count((1, 2)) == 1


def test_out_of_cycles_constraints():
    n2c = {10: 0, 20: 1}
    # read starts and ends on mapped nodes -> first merged transition only
    read = [10, 99, 20]
    cons = generate_out_of_cycles_constraints_from_read(read, n2c)
    assert cons == [(0, NOT_IN_ANY_CYCLE_INDEX)]
    # read not anchored at both ends -> nothing
    assert generate_out_of_cycles_constraints_from_read([99, 10, 20], n2c) == []


def test_node_to_unique_cycle_map():
    cycles = [[1, 2, 3], [3, 4, 5]]
    m = get_node_to_unique_cycle_map(cycles)
    assert m == {1: 0, 2: 0, 4: 1, 5: 1}  # 3 is shared -> excluded


# ---- MST + toposort -------------------------------------------------------


def test_maximal_spanning_tree_prefers_heavy_edges():
    edges = [(0, 1)] * 3 + [(1, 2)] * 2 + [(2, 0)] * 1
    mst = get_maximal_spanning_tree(edges)
    assert set(mst) == {(0, 1), (1, 2)}


def test_order_cycles_linear_chain():
    # three cycles with unique nodes 1xx, 2xx, 3xx; reads traverse 0->1->2
    cycles = [[100, 101], [200, 201], [300, 301]]
    reads = [
        [100, 101, 200],
        [101, 200, 201],
        [200, 201, 300],
        [201, 300, 301],
        [100, 200, 300],
    ]
    order, conf_res, conf_topo = order_cycles(reads, cycles, verbose=False)
    assert order == [0, 1, 2]
    assert 0.0 <= conf_res <= 1.0
    assert 0.0 <= conf_topo <= 1.0
    ordered = get_ordered_cycles(order, cycles)
    assert ordered == cycles


def test_order_cycles_reversed_reads():
    cycles = [[100], [200], [300]]
    reads = [[300, 200], [200, 100], [300, 200, 100]]
    order, _, _ = order_cycles(reads, cycles, verbose=False)
    assert order == [2, 1, 0]


def test_filter_subproblems_matches_naive_loop():
    """Vectorized all-subgraph relevance filter must equal the
    per-subgraph get_relevant_reads/get_relevant_cycles loop."""
    from mcaat_tpu.ordering.ordering import (
        Subgraph,
        filter_subproblems,
        get_minimum_cycles_for_full_coverage,
        get_relevant_cycles,
        get_relevant_reads,
    )

    rng = np.random.default_rng(3)
    for trial in range(5):
        n = 60
        # disjoint node sets (SCC subgraphs partition nodes)
        perm = rng.permutation(n)
        sizes = [2, 3, 5, 4]
        subgraphs, off = [], 0
        for sz in sizes:
            sg = Subgraph()
            comp = perm[off : off + sz]
            for a, b in zip(comp, np.roll(comp, -1)):
                sg.add_edge(int(a), int(b))
            subgraphs.append(sg)
            off += sz
        reads = [
            rng.integers(0, n, size=rng.integers(1, 6)).tolist()
            for _ in range(40)
        ] + [[]]
        cycles = [
            rng.integers(0, n, size=rng.integers(1, 4)).tolist()
            for _ in range(10)
        ]
        # plant cycles fully inside subgraphs so some survive
        for sg in subgraphs:
            nodes = sorted(sg.nodes)
            cycles.append([nodes[0], nodes[-1], nodes[0]])
            cycles.append(list(nodes))
            cycles.append(list(nodes))
            cycles.append([nodes[-1], nodes[0]])

        naive = []
        for sg in subgraphs:
            rr = get_relevant_reads(sg, reads)
            rc = get_minimum_cycles_for_full_coverage(
                get_relevant_cycles(sg, cycles)
            )
            if len(rr) == 0 or len(rc) < 3:
                continue
            naive.append((sg, rr, rc))

        got = filter_subproblems(n, subgraphs, reads, cycles)
        assert len(got) == len(naive), trial
        for (sg_a, rr_a, rc_a), (sg_b, rr_b, rc_b) in zip(naive, got):
            assert sg_a is sg_b
            assert rr_a == rr_b
            assert rc_a == rc_b


def test_keep_crispr_regions_growth_paths_match():
    """The frontier-kernel growth (big graphs) and the full-array
    _grow_region program must produce identical validity."""
    import jax.numpy as jnp

    import mcaat_tpu.ordering.ordering as om
    from mcaat_tpu.graph.dbg import DBG

    rng = np.random.default_rng(9)
    for trial in range(4):
        n = int(rng.integers(200, 800))
        # consistent adjacency (u in out[v] <=> v in in_[u], as in a real
        # DBG): an out-edge is added only if the target has a free in-slot
        out = np.full((n, 4), -1, dtype=np.int32)
        in_ = np.full((n, 4), -1, dtype=np.int32)
        for v in range(n):
            for b in range(int(rng.integers(0, 3))):
                w = int(rng.integers(0, n))
                free = np.nonzero(in_[w] < 0)[0]
                if len(free):
                    out[v, b] = w
                    in_[w, free[0]] = v
        valid = rng.random(n) > 0.3
        g = DBG(
            k=23,
            kmers=jnp.zeros((n,), jnp.int64),
            mult=jnp.ones((n,), jnp.int32),
            out=jnp.asarray(out.reshape(-1)),
            in_=jnp.asarray(in_.reshape(-1)),
            valid=jnp.asarray(valid),
        )
        cycles = [
            rng.integers(0, n, size=rng.integers(2, 6)).tolist()
            for _ in range(3)
        ]
        hops = int(rng.integers(1, 8))
        old_thr = om.GROW_FRONTIER_MIN_NODES
        try:
            om.GROW_FRONTIER_MIN_NODES = 1  # force frontier kernel
            got = np.asarray(
                om.keep_crispr_regions_extended_by_k(g, hops, cycles).valid
            )
            om.GROW_FRONTIER_MIN_NODES = 1 << 60  # force full-array program
            want = np.asarray(
                om.keep_crispr_regions_extended_by_k(g, hops, cycles).valid
            )
        finally:
            om.GROW_FRONTIER_MIN_NODES = old_thr
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_host_region_growth_matches_device(monkeypatch):
    """The pure-host growth path (compact region graphs, r5) must equal
    keep_crispr_regions_extended_by_k's device growth."""
    import numpy as np

    from mcaat_tpu import ordering as _pkg  # noqa: F401
    from mcaat_tpu.graph.dbg import build_dbg_from_reads
    from mcaat_tpu.io.fastq import encode_sequences
    from mcaat_tpu.ordering import ordering as om

    rng = np.random.default_rng(29)
    seqs = ["".join(rng.choice(list("ACGT"), size=80)) for _ in range(60)]
    b = encode_sequences(seqs)
    g = build_dbg_from_reads(b.codes, b.lengths, k=23)
    # pick arbitrary "cycles" among valid nodes
    valid_ids = np.nonzero(np.asarray(g.valid))[0]
    cycles = [valid_ids[:5].tolist(), valid_ids[50:53].tolist()]

    dev = om.keep_crispr_regions_extended_by_k(g, 7, cycles)
    out_h = np.asarray(g.out).reshape(-1, 4)
    in_h = np.asarray(g.in_).reshape(-1, 4)
    valid_h = np.asarray(g.valid)
    seeds = np.unique(
        np.asarray(sorted({v for c in cycles for v in c}), dtype=np.int64)
    )
    reached = om._region_mask_host_arrays(out_h, in_h, valid_h, seeds, 7)
    np.testing.assert_array_equal(valid_h & reached, np.asarray(dev.valid))

    # and the split entry takes the host tier when thresholds allow
    monkeypatch.setattr(om, "GROW_FRONTIER_MIN_NODES", 1)
    g2, subs2 = om.get_crispr_regions_extended_by_k(g, 7, cycles)
    np.testing.assert_array_equal(np.asarray(g2.valid), np.asarray(dev.valid))
