"""Parity: vectorized ordering (ordering.fast) vs the reference-mirroring
tuple implementation, on randomized instances."""

import numpy as np
import pytest

from mcaat_tpu.ordering.fast import (
    generate_constraints_arrays,
    order_cycles_fast,
)
from mcaat_tpu.ordering.ordering import (
    generate_constraints,
    get_node_to_unique_cycle_map,
    order_cycles,
)


def random_instance(seed):
    rng = np.random.default_rng(seed)
    n_cycles = rng.integers(3, 8)
    cycles = []
    next_node = 1000
    for _ in range(n_cycles):
        size = int(rng.integers(3, 10))
        cycles.append(list(range(next_node, next_node + size)))
        next_node += size
    # some shared nodes between consecutive cycles (excluded from the map)
    if n_cycles >= 2:
        cycles[1][0] = cycles[0][0]
    all_nodes = [n for c in cycles for n in c]
    reads = []
    for _ in range(int(rng.integers(5, 30))):
        ln = int(rng.integers(2, 12))
        read = [int(rng.choice(all_nodes)) for _ in range(ln)]
        # sprinkle unmapped nodes
        for j in range(len(read)):
            if rng.random() < 0.2:
                read[j] = int(rng.integers(0, 100))
        reads.append(read)
    return reads, cycles


@pytest.mark.parametrize("seed", range(10))
def test_constraint_aggregation_matches(seed):
    reads, cycles = random_instance(seed)
    m = get_node_to_unique_cycle_map(cycles)
    ref = generate_constraints(reads, m)
    edges, weights = generate_constraints_arrays(reads, m)
    ref_counts = {}
    for e in ref:
        ref_counts[e] = ref_counts.get(e, 0) + 1
    got_counts = {
        (int(edges[i, 0]), int(edges[i, 1])): int(weights[i])
        for i in range(len(edges))
    }
    assert got_counts == ref_counts


@pytest.mark.parametrize("seed", range(10))
def test_order_cycles_fast_matches(seed):
    reads, cycles = random_instance(seed)
    ref_order, ref_cr, ref_ct = order_cycles(reads, cycles, verbose=False)
    fast_order, fast_cr, fast_ct = order_cycles_fast(reads, cycles, verbose=False)
    assert fast_order == ref_order
    assert abs(fast_cr - ref_cr) < 1e-9
    assert abs(fast_ct - ref_ct) < 1e-9
