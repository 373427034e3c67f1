"""Pruning pass tests on handcrafted adjacency."""

import numpy as np
import jax.numpy as jnp

from mcaat_tpu.graph.dbg import DBG
from mcaat_tpu.prune.prune import clip_tips, invalidate_low_multiplicity, prune_graph


def make_graph(out_edges: dict[int, list[int]], n: int, mult=None) -> DBG:
    out = np.full((n, 4), -1, dtype=np.int32)
    in_ = np.full((n, 4), -1, dtype=np.int32)
    out_slot = {u: 0 for u in range(n)}
    in_slot = {u: 0 for u in range(n)}
    for u, vs in out_edges.items():
        for v in vs:
            out[u, out_slot[u]] = v
            out_slot[u] += 1
            in_[v, in_slot[v]] = u
            in_slot[v] += 1
    if mult is None:
        mult = np.full(n, 10, dtype=np.int32)
    return DBG(
        k=23,
        kmers=jnp.arange(n, dtype=jnp.int64),
        mult=jnp.asarray(mult, dtype=jnp.int32),
        out=jnp.asarray(out.reshape(-1)),
        in_=jnp.asarray(in_.reshape(-1)),
        valid=jnp.ones(n, dtype=bool),
    )


def test_invalidate_low_multiplicity():
    g = make_graph({0: [1], 1: [0]}, 3, mult=[10, 1, 5])
    g2, n = invalidate_low_multiplicity(g)
    assert n == 1
    assert list(np.asarray(g2.valid)) == [True, False, True]


def test_clip_tips_chain():
    # cycle 0->1->2->0 with a dead chain 2->3->4
    g = make_graph({0: [1], 1: [2], 2: [0, 3], 3: [4]}, 5)
    g2, n = clip_tips(g)
    valid = np.asarray(g2.valid)
    assert n == 2
    assert list(valid) == [True, True, True, False, False]


def test_clip_tips_preserves_cycle():
    g = make_graph({0: [1], 1: [2], 2: [0]}, 3)
    g2, n = clip_tips(g)
    assert n == 0
    assert np.asarray(g2.valid).all()


def test_prune_graph_combined():
    # mult-1 node 3 feeds the cycle; clipping must not eat the cycle
    g = make_graph({0: [1], 1: [2], 2: [0], 3: [0]}, 4, mult=[10, 10, 10, 1])
    g2 = prune_graph(g, verbose=False)
    assert list(np.asarray(g2.valid)) == [True, True, True, False]
