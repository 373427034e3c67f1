"""Read → node-chain mapping.

Replaces reference ``src/reads.cpp:33-130``: every k-mer window of every
read is mapped to a node id in one batched device lookup (vectorized
binary search over the sorted k-mer table), instead of a scalar
``IndexBinarySearch`` per window. A read is kept iff its *first or last*
window's node is in the cycle-node set (src/reads.cpp:74-76); a kept read
is its full chain of node ids, including misses (-1), mirroring the
reference which stores whatever IndexBinarySearch returns.

Reads with ``len(seq) <= 2k`` are skipped (src/reads.cpp:64-66).
Mate-2 sequences are reverse-complemented before mapping
(src/reads.cpp:116-127).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from mcaat_tpu.graph.dbg import DBG
from mcaat_tpu.io.fastq import ReadBatch, encode_sequences, read_sequences, reverse_complement
from mcaat_tpu.kmer.count import extract_kmers


def map_reads_to_nodes(graph: DBG, batch: ReadBatch) -> tuple[np.ndarray, np.ndarray]:
    """All window node-ids per read: ``ids[R, W]`` int32 (-1 miss), lengths.

    ``n_windows[i] = lengths[i] - k + 1`` live windows per read.
    """
    if batch.num_reads == 0 or batch.max_len < graph.k:
        return (
            np.zeros((batch.num_reads, 0), dtype=np.int32),
            np.zeros((batch.num_reads,), dtype=np.int32),
        )
    kmers = extract_kmers(jnp.asarray(batch.codes), jnp.asarray(batch.lengths), graph.k)
    ids = graph.lookup(kmers.reshape(-1)).reshape(kmers.shape)
    n_windows = np.maximum(np.asarray(batch.lengths) - graph.k + 1, 0).astype(np.int32)
    return np.asarray(ids), n_windows


def chains_from_ids(
    ids: np.ndarray,
    n_windows: np.ndarray,
    lengths: np.ndarray,
    k: int,
    cycle_nodes: set[int],
) -> list[list[int]]:
    """Filter + materialize node chains (≙ get_read_from_sequence).

    The keep predicate (first-or-last window node in the cycle set,
    src/reads.cpp:74-76) is evaluated vectorized over all reads; only the
    (rare) kept reads are materialized as Python lists.
    """
    R = ids.shape[0]
    if R == 0 or ids.shape[1] == 0:
        return []
    lengths = np.asarray(lengths)
    n_windows = np.asarray(n_windows)
    firsts = ids[:, 0]
    lasts = ids[np.arange(R), np.clip(n_windows - 1, 0, ids.shape[1] - 1)]
    cyc = np.fromiter(cycle_nodes, dtype=np.int64, count=len(cycle_nodes))
    cyc.sort()
    eligible = (lengths > 2 * k) & (n_windows > 0)
    keep = eligible & (np.isin(firsts, cyc) | np.isin(lasts, cyc))
    return [
        ids[r, : int(n_windows[r])].tolist() for r in np.nonzero(keep)[0]
    ]


def get_reads(
    graph: DBG,
    fastq_file_1: str,
    fastq_file_2: Optional[str],
    cycles: list[list[int]],
) -> list[list[int]]:
    """≙ reference ``get_reads`` (src/reads.cpp:91-130)."""
    cycle_nodes: set[int] = set()
    for cycle in cycles:
        cycle_nodes.update(int(n) for n in cycle)

    chains: list[list[int]] = []
    seqs = read_sequences(fastq_file_1)
    chains.extend(_map_sequences(graph, seqs, cycle_nodes))
    if fastq_file_2:
        seqs2 = [reverse_complement(s) for s in read_sequences(fastq_file_2)]
        chains.extend(_map_sequences(graph, seqs2, cycle_nodes))
    return chains


def _map_sequences(
    graph: DBG,
    sequences: list[str],
    cycle_nodes: set[int],
    chunk_reads: int = 1 << 20,
) -> list[list[int]]:
    """Batched window lookup in read blocks (memory-bounded at scale)."""
    if not sequences:
        return []
    from mcaat_tpu.graph.dbg import _bucket_size

    chains: list[list[int]] = []
    for lo in range(0, len(sequences), chunk_reads):
        batch = encode_sequences(
            sequences[lo : lo + chunk_reads], pad_to_multiple=32
        )
        # bucket the row count so repeat runs reuse compiled programs;
        # zero-length pad rows produce no windows and are filtered out
        R = batch.num_reads
        R_pad = _bucket_size(R)
        if R_pad > R:
            codes = np.zeros((R_pad, batch.max_len), dtype=np.uint8)
            codes[:R] = batch.codes
            lengths = np.zeros((R_pad,), dtype=np.int32)
            lengths[:R] = batch.lengths
            batch = ReadBatch(codes=codes, lengths=lengths)
        ids, n_windows = map_reads_to_nodes(graph, batch)
        chains.extend(
            chains_from_ids(
                ids[:R], n_windows[:R], batch.lengths[:R], graph.k, cycle_nodes
            )
        )
    return chains
