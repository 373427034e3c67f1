"""Adjacency probe at the 796M-window run's shapes (VERDICT r3 weak #2).

The 800M artifact's adjacency ran 3x48M-edge chunks (124.5M edges > the
96M single-shot cutoff) at 15.7s; each chunk re-sorts the 134.2M-row
node table, so the chunked path sorts 3x(134+48)M = 546M rows where a
single shot sorts 268M. This probe measures, at the exact 800M-run
buckets (N = E = bucket(124.5M) = 134,217,728):

  * chunked 48M (production today)
  * chunked 64M (2 chunks: 396M sorted rows)
  * single-shot  (268M sorted rows — may OOM a 16GB v5e; runs LAST so
    an OOM loses nothing)

plus device memory stats after each, to decide whether the single-shot
cutoff can rise past 124.5M edges (graph/dbg.py build_dbg single_shot_max).
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import mcaat_tpu  # noqa: F401

import jax
import jax.numpy as jnp

from mcaat_tpu.graph.dbg import (
    _build_adjacency,
    _bucket_size,
    build_adjacency_chunked,
)
from mcaat_tpu.kmer.count import SENTINEL

k = 23
n_nodes = 124_506_334
n_edges = 124_490_385
Nb = _bucket_size(n_nodes)
Eb = _bucket_size(n_edges)
print(f"buckets: nodes {Nb} edges {Eb}", flush=True)
rng = np.random.default_rng(0)
km = np.unique(
    rng.integers(0, 1 << 46, size=int(n_nodes * 1.02), dtype=np.int64)
)[:n_nodes]
kmers = np.full(Nb, SENTINEL, np.int64)
kmers[:n_nodes] = km
src = rng.integers(0, n_nodes, size=n_edges, dtype=np.int64)
e = np.sort((km[src] << 2) | rng.integers(0, 4, n_edges, dtype=np.int64))
edges = np.full(Eb, SENTINEL, np.int64)
edges[:n_edges] = e
u_id = np.full(Eb, -1, np.int32)
u_id[:n_edges] = np.searchsorted(km, e >> 2).astype(np.int32)
del src, e, km
kmers_j = jnp.asarray(kmers)
edges_j = jnp.asarray(edges)
uid_j = jnp.asarray(u_id)
_ = int(kmers_j[0]), int(edges_j[0]), int(uid_j[0])  # materialize
print("uploaded", flush=True)


def memstats(tag):
    try:
        st = jax.local_devices()[0].memory_stats() or {}
        peak = st.get("peak_bytes_in_use")
        if peak is not None:
            print(f"  [{tag}] peak_bytes_in_use={peak/2**30:.2f}GiB", flush=True)
    except Exception as ex:  # stats may be unsupported over the tunnel
        print(f"  [{tag}] memory_stats unavailable: {ex}", flush=True)


for chunk in (48_000_000, 64_000_000):
    for trial in range(2):
        t0 = time.perf_counter()
        o, i = build_adjacency_chunked(
            kmers_j, edges_j, n_edges, k=k, u_id=uid_j, chunk_edges=chunk
        )
        _ = int(o[0]), int(i[0])
        print(
            f"chunked{chunk//10**6}M trial {trial}: "
            f"{time.perf_counter()-t0:.2f}s",
            flush=True,
        )
        del o, i
    memstats(f"chunked{chunk//10**6}M")

for trial in range(2):
    t0 = time.perf_counter()
    try:
        o, i = _build_adjacency(kmers_j, edges_j, jnp.asarray(n_edges), k=k, u_id=uid_j)
        _ = int(o[0]), int(i[0])
    except Exception as ex:
        print(f"single-shot trial {trial} FAILED: {type(ex).__name__}: {ex}",
              flush=True)
        break
    print(f"single-shot trial {trial}: {time.perf_counter()-t0:.2f}s", flush=True)
    del o, i
memstats("single-shot")
print("DONE", flush=True)
