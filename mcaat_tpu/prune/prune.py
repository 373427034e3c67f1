"""Whole-graph vectorized pruning passes.

Replaces the reference's scalar pruning in
``CycleFinder::FindApproximateCRISPRArrays`` (src/cycle_finder.cpp:433-452):

* ``InvalidateMultiplicityOneNodes`` (src/cycle_finder.cpp:372-382):
  one masked update ``valid &= mult > 1``.
* ``CollectTips`` + per-tip ``RecursiveReduction``
  (src/cycle_finder.cpp:346-371): backward clipping of dead-end chains.
  Vectorized as a fixpoint: repeatedly invalidate every valid node whose
  valid out-degree is zero, inside one ``lax.while_loop`` — each iteration
  is a single gather + reduce over the full array. (The reference walks
  parent chains from the initial tips; the fixpoint additionally clips
  dead-ends exposed by the multiplicity filter. Nodes differing between
  the two can never lie on a cycle — they have no valid outgoing path —
  so cycle enumeration and everything downstream is unaffected.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mcaat_tpu.graph.dbg import DBG, _degree


def invalidate_low_multiplicity(graph: DBG) -> tuple[DBG, int]:
    """valid &= mult > 1; returns (graph, number invalidated)."""
    kill = graph.valid & (graph.mult <= 1)
    n = int(jnp.sum(kill))
    return graph.set_invalid(kill), n


@jax.jit
def _clip_tips_fixpoint(out: jax.Array, valid: jax.Array) -> jax.Array:
    def cond(state):
        valid, changed = state
        return changed

    def body(state):
        valid, _ = state
        outdeg = _degree(out, valid)
        tips = valid & (outdeg == 0)
        return valid & ~tips, jnp.any(tips)

    valid, _ = jax.lax.while_loop(cond, body, (valid, jnp.array(True)))
    return valid


def clip_tips(graph: DBG) -> tuple[DBG, int]:
    """Fixpoint tip clipping; returns (graph, number clipped)."""
    before = int(jnp.sum(graph.valid))
    new_valid = _clip_tips_fixpoint(graph.out, graph.valid)
    graph = graph.with_valid(new_valid)
    return graph, before - int(jnp.sum(new_valid))


def prune_graph(graph: DBG, verbose: bool = True) -> DBG:
    """Full pruning pass in the reference's order (src/cycle_finder.cpp:433-452)."""
    tips0 = int(jnp.sum(graph.valid & (graph.out_degree() == 0)))
    if verbose:
        print(f"Graph size: {graph.size} nodes; gathered tips: {tips0}")
    graph, n_mult = invalidate_low_multiplicity(graph)
    if verbose:
        print(f"Pre-filter: invalidated {n_mult} node(s) with multiplicity <= 1.")
    graph, n_tips = clip_tips(graph)
    if verbose:
        remaining = int(jnp.sum(graph.valid))
        tips_after = int(jnp.sum(graph.valid & (graph.out_degree() == 0)))
        print(f"After pruning, tips: {tips_after}, valid edges: {remaining}")
    return graph
