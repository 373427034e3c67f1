import time, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import mcaat_tpu
import jax, jax.numpy as jnp
from mcaat_tpu.graph.dbg import _build_adjacency, build_adjacency_chunked, _bucket_size
from mcaat_tpu.kmer.count import SENTINEL

k = 23
n_nodes = 94_374_274
n_edges = 94_362_112
Nb = _bucket_size(n_nodes); Eb = _bucket_size(n_edges)
print(f"buckets: nodes {Nb} edges {Eb}", flush=True)
rng = np.random.default_rng(0)
# synthetic sorted unique node k-mers (46-bit)
km = np.unique(rng.integers(0, 1 << 46, size=int(n_nodes * 1.02), dtype=np.int64))[:n_nodes]
kmers = np.full(Nb, SENTINEL, np.int64); kmers[:n_nodes] = km
# edges: source = random node index, edge = (u<<2)|b  (sorted)
src = rng.integers(0, n_nodes, size=n_edges, dtype=np.int64)
e = np.sort((km[src] << 2) | rng.integers(0, 4, n_edges, dtype=np.int64))
edges = np.full(Eb, SENTINEL, np.int64); edges[:n_edges] = e
u_id = np.full(Eb, -1, np.int32)
u_id[:n_edges] = np.searchsorted(km, e >> 2).astype(np.int32)
kmers_j = jnp.asarray(kmers); edges_j = jnp.asarray(edges); uid_j = jnp.asarray(u_id)
kmers_j.block_until_ready(); edges_j.block_until_ready(); uid_j.block_until_ready()
print("uploaded", flush=True)

for trial in range(2):
    t0 = time.perf_counter()
    o, i = build_adjacency_chunked(kmers_j, edges_j, n_edges, k=k, u_id=uid_j)
    _ = int(o[0]); _ = int(i[0])
    print(f"chunked16M trial {trial}: {time.perf_counter()-t0:.2f}s", flush=True)
    del o, i

for trial in range(2):
    t0 = time.perf_counter()
    o, i = build_adjacency_chunked(kmers_j, edges_j, n_edges, k=k, u_id=uid_j, chunk_edges=48_000_000)
    _ = int(o[0]); _ = int(i[0])
    print(f"chunked48M trial {trial}: {time.perf_counter()-t0:.2f}s", flush=True)
    del o, i

for trial in range(2):
    t0 = time.perf_counter()
    o, i = _build_adjacency(kmers_j, edges_j, jnp.asarray(n_edges), k=k, u_id=uid_j)
    _ = int(o[0]); _ = int(i[0])
    print(f"single-shot trial {trial}: {time.perf_counter()-t0:.2f}s", flush=True)
    del o, i
