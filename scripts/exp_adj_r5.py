"""Adjacency single-shot roofline attribution (VERDICT r4 #6).

The 796M-window run's single-shot adjacency costs 11.0s at
N = E = bucket(124.5M) = 134,217,728 — the largest compiled-program
cost in the build. The measured sort primitive (~55ms/8M int64 rows)
prices a 268M-row sort at ~1.9s, so 11s implies several full-size
passes. This probe measures each pass's marginal at the exact shapes
(programs returning scalars only — materialized outputs would swamp
the marginals with HBM traffic):

  m0: elementwise edge decode (u/v/base extraction)       — baseline
  m1: + the 268M-row join sort (key2-packed, 2 operands)
  m1b:+ the 268M-row join sort (3-operand key/tag/orig — the r4 form)
  m2: + cumsum + sort-back (rank to original order)
  m3: + the 134M random hit-verification gather (r4 form)
  full_trusted:  _build_adjacency with _join_lookup1_trusted (r5)
  full_verified: _build_adjacency with MCAAT_VERIFY_ADJ=1 (r4 form)

Synthetic edges at the real buckets: suffix membership does not hold
(random v), so only WALLS are compared here — result parity of the
trusted join is covered by tests/test_graph.py on real builds.

Run on the TPU:  python scripts/exp_adj_r5.py
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import mcaat_tpu  # noqa: F401

import jax
import jax.numpy as jnp

from mcaat_tpu.graph.dbg import _build_adjacency, _bucket_size
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

mask_k = (np.int64(1) << np.int64(2 * k)) - 1


@jax.jit
def m0(table, edges24):
    v = edges24 & jnp.int64(mask_k)
    last = (edges24 & jnp.int64(3)).astype(jnp.int32)
    first = (edges24 >> jnp.int64(2 * k)).astype(jnp.int32)
    return jnp.sum(v) + jnp.sum(last) + jnp.sum(first)


def _key2(table, q):
    big = jnp.int64(1) << jnp.int64(62)
    return jnp.concatenate(
        [
            jnp.where(table == SENTINEL, big, table << jnp.int64(1)),
            jnp.where(q == SENTINEL, big | 1, (q << jnp.int64(1)) | jnp.int64(1)),
        ]
    )


@jax.jit
def m1(table, edges24):
    v = edges24 & jnp.int64(mask_k)
    k2 = _key2(table, v)
    orig = jnp.arange(k2.shape[0], dtype=jnp.int32)
    sk, so = jax.lax.sort((k2, orig), num_keys=1)
    return jnp.sum(sk) + jnp.sum(so)


@jax.jit
def m1b(table, edges24):
    v = edges24 & jnp.int64(mask_k)
    T = table.shape[0]
    keys = jnp.concatenate([table, v])
    n = keys.shape[0]
    tag = (jnp.arange(n, dtype=jnp.int32) >= T).astype(jnp.int32)
    orig = jnp.arange(n, dtype=jnp.int32)
    sk, st, so = jax.lax.sort((keys, tag, orig), num_keys=2)
    return jnp.sum(sk) + jnp.sum(st) + jnp.sum(so)


@jax.jit
def m2(table, edges24):
    v = edges24 & jnp.int64(mask_k)
    T = table.shape[0]
    k2 = _key2(table, v)
    orig = jnp.arange(k2.shape[0], dtype=jnp.int32)
    sk, so = jax.lax.sort((k2, orig), num_keys=1)
    rank = jnp.cumsum(1 - (sk & 1).astype(jnp.int32)) - 1
    _o, rank_orig = jax.lax.sort((so, rank), num_keys=1)
    return jnp.sum(rank_orig[T:])


@jax.jit
def m3(table, edges24):
    v = edges24 & jnp.int64(mask_k)
    T = table.shape[0]
    k2 = _key2(table, v)
    orig = jnp.arange(k2.shape[0], dtype=jnp.int32)
    sk, so = jax.lax.sort((k2, orig), num_keys=1)
    rank = jnp.cumsum(1 - (sk & 1).astype(jnp.int32)) - 1
    _o, rank_orig = jax.lax.sort((so, rank), num_keys=1)
    r = rank_orig[T:]
    rc = jnp.clip(r, 0, T - 1)
    hit = (r >= 0) & (table[rc] == v) & (v != SENTINEL)
    return jnp.sum(jnp.where(hit, rc, -1))


@functools.partial(jax.jit, static_argnames=())
def full(table, edges24, uid):
    out, in_ = _build_adjacency(table, edges24, jnp.asarray(n_edges), k=k, u_id=uid)
    return jnp.sum(out[:: 1 << 16]) + jnp.sum(in_[:: 1 << 16])


def wall(fn, *args, reps=3):
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        r = int(fn(*args))
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return best, r


res = {}
for name, fn, args in [
    ("m0_decode", m0, (kmers_j, edges_j)),
    ("m1_sort_key2", m1, (kmers_j, edges_j)),
    ("m1b_sort_3op", m1b, (kmers_j, edges_j)),
    ("m2_rank_sortback", m2, (kmers_j, edges_j)),
    ("m3_verify_gather", m3, (kmers_j, edges_j)),
]:
    dt, _ = wall(fn, *args)
    res[name] = round(dt, 3)
    print(f"{name}: {dt:.3f}s", flush=True)

# full builds last (largest footprint)
import os

dt, _ = wall(full, kmers_j, edges_j, uid_j)
res["full_trusted"] = round(dt, 3)
print(f"full_trusted: {dt:.3f}s", flush=True)

os.environ["MCAAT_VERIFY_ADJ"] = "1"
jax.clear_caches()
dt, _ = wall(full, kmers_j, edges_j, uid_j)
res["full_verified_r4"] = round(dt, 3)
print(f"full_verified_r4: {dt:.3f}s", flush=True)

res["marginals"] = {
    "join_sort": round(res["m1_sort_key2"] - res["m0_decode"], 3),
    "sort_3op_extra": round(res["m1b_sort_3op"] - res["m1_sort_key2"], 3),
    "rank_sortback": round(res["m2_rank_sortback"] - res["m1_sort_key2"], 3),
    "verify_gather": round(res["m3_verify_gather"] - res["m2_rank_sortback"], 3),
    "scatters_and_rest": round(res["full_trusted"] - res["m2_rank_sortback"], 3),
}
print(json.dumps(res, indent=2))
with open("/root/repo/EXP_ADJ_r5.json", "w") as fh:
    json.dump(res, fh, indent=2)
