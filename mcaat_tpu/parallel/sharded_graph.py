"""Distributed de Bruijn graph: node table + adjacency sharded over kp.

The single-chip ``graph.dbg.DBG`` holds the whole structure-of-arrays in
one HBM. At 1B+ nodes the table must shard (SURVEY §7.3 risk 4): here the
k-mer space is radix-partitioned by the packed k-mer's top bits over the
mesh's ``kp`` axis, so shard s owns a contiguous sorted range.

Key property exploited for the build: a 24-mer edge ``e = u·b`` has the
same top bits as its source 23-mer ``u`` (``e >> (48-bits) == u >>
(46-bits)``), so every edge is co-located with its source node — the
*out*-adjacency builds entirely locally. Destination ids and the
*in*-adjacency require one routed exchange each (``all_to_all`` over kp).

Global node id = ``shard * T + local_rank`` with fixed per-shard capacity
``T``; SENTINEL-padded tails keep shapes static.

`frontier_step` is the distributed BFS primitive: global node ids route to
their owner shard, the owner gathers out-neighbors, results route back —
the communication shape of the distributed cycle search and read mapper
(SURVEY §5 "long-context" analog).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mcaat_tpu.kmer.count import (
    SENTINEL,
    count_unique,
    derive_nodes_from_edges,
    extract_kmers,
    extract_last_kmer,
)
from mcaat_tpu.parallel.sharded import _bucket_by_owner, _owner_shift

shard_map = jax.shard_map


@functools.lru_cache(maxsize=None)
def _replicator(mesh: Mesh):
    from jax.sharding import NamedSharding

    return jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))


def host_replicated(mesh: Mesh, x) -> np.ndarray:
    """Host numpy view of a mesh-sharded array, valid across processes.

    Single-process: plain ``np.asarray`` (every shard is addressable).
    Multi-process: a kp-sharded array is NOT fully addressable, so one
    jitted identity with replicated out_sharding all-gathers it first —
    every process executes this (the host orchestration loops are
    replicated across processes by design). Use only for O(N)-bounded
    masks/ids, never for adjacency-sized arrays.
    """
    if jax.process_count() == 1:
        return np.asarray(x)
    return np.asarray(_replicator(mesh)(x))


@dataclass
class ShardedDBG:
    """Per-shard arrays; leading axis is the kp shard."""

    k: int
    mesh: Mesh
    kmers: jax.Array  # int64 [kp, T] sorted per shard, SENTINEL pad
    mult: jax.Array  # int32 [kp, T]
    out: jax.Array  # int32 [kp, 4T] flat GLOBAL node ids, -1 absent
    in_: jax.Array  # int32 [kp, 4T] flat GLOBAL node ids, -1 absent
    valid: jax.Array  # bool  [kp, T]
    route_cap: int = 0  # all_to_all bucket capacity the build used
    # adjacency is flat (slot 4*local+base): a materialized [T,4] int32
    # buffer on TPU pads the minor dim 4 -> 128 lanes (32x HBM)

    @property
    def shard_capacity(self) -> int:
        return int(self.kmers.shape[1])

    @property
    def n_nodes(self) -> int:
        return int(jnp.sum(self.kmers != SENTINEL))

    def to_single_device(self):
        """Materialize a host-side global view (tests / small graphs)."""
        kp, T = self.kmers.shape
        return (
            np.asarray(self.kmers).reshape(kp * T),
            np.asarray(self.mult).reshape(kp * T),
            np.asarray(self.out).reshape(kp * T, 4),
            np.asarray(self.valid).reshape(kp * T),
            np.asarray(self.in_).reshape(kp * T, 4),
        )  # host reshape to [.,4] is numpy — unpadded


@functools.partial(
    jax.jit, static_argnames=("mesh", "k", "route_cap", "shard_cap")
)
def build_sharded_dbg_arrays(
    mesh: Mesh,
    codes: jax.Array,
    lengths: jax.Array,
    k: int,
    route_cap: int = 1 << 16,
    shard_cap: int = 1 << 16,
):
    """Distributed graph build over the ("dp", "kp") mesh.

    Returns (kmers [kp,T], mult [kp,T], out [kp,T,4], dropped scalar).
    """
    kp = mesh.shape["kp"]
    shift23 = _owner_shift(k, kp)
    shift24 = _owner_shift(k + 1, kp)
    T = shard_cap
    mask_k = (np.int64(1) << np.int64(2 * k)) - 1

    def step(codes_local, lengths_local):
        my_kp = jax.lax.axis_index("kp")
        # ---- distributed counting: route ONLY the 24-mer edges and each
        # read's last 23-window. An edge shares its top bits with its
        # source 23-mer, so every node k-mer reaches its owner shard as a
        # prefix of a routed edge or as a routed last window — the full
        # 23-mer window multiset (the largest array, ~window-count rows)
        # never crosses the interconnect, and the node table derives
        # shard-locally from the unique edge table (derive_nodes_from_edges)
        km24 = extract_kmers(codes_local, lengths_local, k + 1).reshape(-1)
        last23 = extract_last_kmer(codes_local, lengths_local, k)
        s24, d24 = _bucket_by_owner(km24, kp, shift24, route_cap)
        s_l, d_l = _bucket_by_owner(last23, kp, shift23, route_cap)
        r24 = jax.lax.all_to_all(s24[None], "kp", 1, 1, tiled=False)[0].reshape(-1)
        r_l = jax.lax.all_to_all(s_l[None], "kp", 1, 1, tiled=False)[0].reshape(-1)
        a24 = jax.lax.all_gather(r24, "dp", tiled=True)
        a_l = jax.lax.all_gather(r_l, "dp", tiled=True)
        u24, c24, n24 = count_unique(a24)
        u_l, c_l, _n_l = count_unique(a_l)
        u23f, c23f, _n23, u_id = derive_nodes_from_edges(
            u24, c24, n24, u_l, c_l
        )
        u23 = u23f[:T]
        c23 = c23f[:T]
        u_id = u_id[: 4 * T]
        u24 = u24[: 4 * T]

        # ---- local out-adjacency (edges are co-located with sources) ---
        v = u24 & jnp.int64(mask_k)
        b = (u24 & jnp.int64(3)).astype(jnp.int32)
        live_e = u24 != SENTINEL
        # source ids come from the derivation; ids beyond the shard
        # capacity T are dropped (same overflow contract as the table slice)
        u_pos_c = jnp.minimum(jnp.maximum(u_id, 0), T - 1)
        u_ok = live_e & (u_id >= 0) & (u_id < T)
        # v may live anywhere: route v to its owner, get global ids back
        v_gid = _routed_lookup(u23, jnp.where(u_ok, v, SENTINEL), kp, shift23,
                               route_cap, T, my_kp)
        ok = u_ok & (v_gid >= 0)
        dump = jnp.int32(4 * T)
        slots = jnp.where(ok, u_pos_c.astype(jnp.int32) * 4 + b, dump)
        out_flat = (
            jnp.full((4 * T + 1,), -1, dtype=jnp.int32)
            .at[slots]
            .set(jnp.where(ok, v_gid, -1), unique_indices=True,
                 indices_are_sorted=True)
        )
        out_local = out_flat[: 4 * T]

        # ---- in-adjacency: route (v, first_base, u_gid) to owner(v) ----
        first = ((u24 >> jnp.int64(2 * k)) & jnp.int64(3)).astype(jnp.int64)
        u_gid = (my_kp.astype(jnp.int32) * T + u_pos_c.astype(jnp.int32)).astype(
            jnp.int64
        )
        key = jnp.where(ok, v, SENTINEL)
        payload = jnp.where(ok, u_gid * 4 + first, jnp.int64(-1))
        ownerv = jnp.where(
            key != SENTINEL, (key >> shift23).astype(jnp.int32), kp
        )
        order = jnp.argsort(ownerv, stable=True)
        key_s = key[order]
        pay_s = payload[order]
        owner_s = ownerv[order]
        bounds = jnp.searchsorted(owner_s, jnp.arange(kp + 1, dtype=jnp.int32))
        starts, ends = bounds[:kp], bounds[1:]
        nq = key.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (kp, route_cap), 1)
        idx = starts[:, None] + col
        live = idx < ends[:, None]
        idx_c = jnp.minimum(idx, nq - 1)
        send_k = jnp.where(live, key_s[idx_c], SENTINEL)
        send_p = jnp.where(live, pay_s[idx_c], jnp.int64(-1))
        d_in = jnp.sum(jnp.maximum(ends - starts - route_cap, 0))
        recv_k = jax.lax.all_to_all(send_k[None], "kp", 1, 1, tiled=False)[0].reshape(-1)
        recv_p = jax.lax.all_to_all(send_p[None], "kp", 1, 1, tiled=False)[0].reshape(-1)
        v_pos = jnp.searchsorted(
            u23, recv_k, method="sort" if recv_k.size >= 4096 else "scan"
        )
        v_pos_c = jnp.minimum(v_pos, T - 1)
        hit = (recv_k != SENTINEL) & (u23[v_pos_c] == recv_k) & (recv_p >= 0)
        in_slot = jnp.where(
            hit,
            v_pos_c.astype(jnp.int32) * 4 + (recv_p & 3).astype(jnp.int32),
            dump,
        )
        in_flat = (
            jnp.full((4 * T + 1,), -1, dtype=jnp.int32)
            .at[in_slot]
            .set(
                jnp.where(hit, (recv_p >> 2).astype(jnp.int32), -1),
                unique_indices=True,
            )
        )
        in_local = in_flat[: 4 * T]

        dropped = jax.lax.psum(d_l + d24 + d_in, ("dp", "kp"))
        return u23[None], c23[None], out_local[None], in_local[None], dropped

    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(("dp", "kp"), None), P(("dp", "kp"))),
        out_specs=(
            P(None, "kp"),
            P(None, "kp"),
            P(None, "kp"),
            P(None, "kp"),
            P(),
        ),
        check_vma=False,
    )
    kmers, mult, out, in_, dropped = fn(codes, lengths)
    kp_n = mesh.shape["kp"]
    return (
        kmers.reshape(kp_n, T),
        mult.reshape(kp_n, T),
        out.reshape(kp_n, 4 * T),
        in_.reshape(kp_n, 4 * T),
        dropped,
    )


def _routed_lookup(table_local, queries, kp, shift, route_cap, T, my_kp):
    """Inside shard_map: route queries to owners, search, route back.

    Returns GLOBAL node ids (owner*T + local pos), -1 for misses, aligned
    with the input query order.
    """
    n = queries.shape[0]
    owner = jnp.where(
        queries != SENTINEL, (queries >> shift).astype(jnp.int32), kp
    )
    order = jnp.argsort(owner, stable=True)
    q_sorted = queries[order]
    owner_sorted = owner[order]
    bounds = jnp.searchsorted(owner_sorted, jnp.arange(kp + 1, dtype=jnp.int32))
    starts, ends = bounds[:kp], bounds[1:]
    col = jax.lax.broadcasted_iota(jnp.int32, (kp, route_cap), 1)
    idx = starts[:, None] + col
    live = idx < ends[:, None]
    idx_c = jnp.minimum(idx, n - 1)
    send = jnp.where(live, q_sorted[idx_c], SENTINEL)

    recv = jax.lax.all_to_all(send[None], "kp", 1, 1, tiled=False)[0]
    flat = recv.reshape(-1)
    method = "sort" if flat.size >= 4096 else "scan"
    pos = jnp.searchsorted(table_local, flat, method=method)
    pos_c = jnp.minimum(pos, T - 1)
    hit = (flat != SENTINEL) & (table_local[pos_c] == flat)
    gid = jnp.where(hit, my_kp.astype(jnp.int32) * T + pos_c.astype(jnp.int32), -1)
    back = jax.lax.all_to_all(
        gid.reshape(kp, route_cap)[None], "kp", 1, 1, tiled=False
    )[0]
    out_sorted = jnp.full((n,), -1, dtype=jnp.int32)
    out_sorted = out_sorted.at[
        jnp.where(live, idx_c, n).reshape(-1)
    ].set(back.reshape(-1), mode="drop")
    return jnp.zeros((n,), jnp.int32).at[order].set(out_sorted)


def build_sharded_dbg(
    mesh: Mesh,
    codes,
    lengths,
    k: int = 23,
    route_cap: int = 1 << 16,
    shard_cap: int = 1 << 16,
) -> tuple[ShardedDBG, int]:
    kmers, mult, out, in_, dropped = build_sharded_dbg_arrays(
        mesh, jnp.asarray(codes), jnp.asarray(lengths), k,
        route_cap=route_cap, shard_cap=shard_cap,
    )
    graph = ShardedDBG(
        k=k, mesh=mesh, kmers=kmers, mult=mult, out=out, in_=in_,
        valid=kmers != SENTINEL, route_cap=route_cap,
    )
    return graph, int(dropped)


@functools.partial(jax.jit, static_argnames=("mesh", "n_passes"))
def _sharded_chain_collapse(mesh: Mesh, out: jax.Array, valid: jax.Array,
                            n_passes: int):
    """Distributed unary-chain collapse by pointer doubling.

    The O(N) per-node work (degrees, successor pick, doubling gathers)
    runs sharded; each doubling pass replicates the (int32) pointer array
    with one ``all_gather`` over kp — log2(N) collectives total instead
    of one per clipped chain LEVEL (a single long linear chain made the
    per-level loop issue hundreds of thousands of collectives inside one
    program). At 1B+ nodes the replicated gather should become a routed
    ``all_to_all`` exchange (frontier_step's shape); for current shard
    counts the gather is the faster, simpler choice.
    Returns (ntype [kp,T], ptr [kp,T] of GLOBAL ids).
    """
    from mcaat_tpu.prune.prune import _BRANCH, _DEAD, _UNARY

    kp = mesh.shape["kp"]
    T = valid.shape[1]

    def step(out_l, valid_l):
        out_l = out_l[0]  # flat [4T], global neighbor ids
        valid_l = valid_l[0]
        my = jax.lax.axis_index("kp")
        vall = jax.lax.all_gather(valid_l, "kp", tiled=True)  # [kp*T]
        adj_ok = (out_l >= 0) & vall[jnp.maximum(out_l, 0)]
        # strided flat slices, not reshape(T, 4) — see prune._chain_collapse
        deg = adj_ok[0::4].astype(jnp.int32)
        succ = jnp.where(adj_ok[0::4], out_l[0::4], -1)
        for b in range(1, 4):
            deg = deg + adj_ok[b::4]
            succ = jnp.maximum(succ, jnp.where(adj_ok[b::4], out_l[b::4], -1))
        ntype = jnp.where(
            ~valid_l | (deg == 0), _DEAD, jnp.where(deg == 1, _UNARY, _BRANCH)
        ).astype(jnp.int32)
        gids = my.astype(jnp.int32) * T + jnp.arange(T, dtype=jnp.int32)
        ptr = jnp.where(ntype == _UNARY, succ, gids)

        def body(_, p):
            pall = jax.lax.all_gather(p, "kp", tiled=True)
            return pall[p]

        ptr = jax.lax.fori_loop(0, n_passes, body, ptr)
        return ntype[None], ptr[None]

    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(None, "kp"), P(None, "kp")),
        out_specs=(P(None, "kp"), P(None, "kp")),
        check_vma=False,
    )
    nt, pt = fn(out.reshape(1, -1), valid.reshape(1, -1))
    return nt.reshape(kp, T), pt.reshape(kp, T)


def sharded_prune_and_candidates(
    mesh: Mesh,
    mult: jax.Array,  # [kp, T]
    out: jax.Array,  # [kp, 4T] flat global ids
    in_: jax.Array,  # [kp, 4T] flat global ids
    valid: jax.Array,  # [kp, T]
    threshold_multiplicity: int = 20,
):
    """Distributed pruning + start-node candidate scan.

    Multiplicity ≤ 1 invalidation and the chain collapse run sharded on
    device (see ``_sharded_chain_collapse``); the condensed branch-node
    fixpoint + final classification run on host over the collapsed
    pointers (the branch set is tiny — same split as
    ``prune.clip_tips``). Returns (valid [kp, T], candidates [kp, T]).
    """
    from mcaat_tpu.cycles.start_nodes import _candidate_mask
    from mcaat_tpu.prune.prune import (
        _BRANCH,
        _condensed_slots,
        _final_valid,
    )

    kp = mesh.shape["kp"]
    T = mult.shape[1]
    N = kp * T
    valid0 = valid & (mult > 1)
    n_passes = max(int(np.ceil(np.log2(max(N, 2)))) + 1, 1)
    ntype, ptr = _sharded_chain_collapse(mesh, out, valid0, n_passes)

    # all O(N) work stays on device: the flat [kp,T]/[kp,4T] layout equals
    # the single-device global-id layout (slot 4g+b), so the single-device
    # jitted helpers apply directly. Host sees only the (tiny) branch-row
    # condensed classes for the aliveness fixpoint — same split as
    # prune.clip_tips.
    ntype_f = ntype.reshape(-1)
    ptr_f = ptr.reshape(-1)
    out_f = out.reshape(-1)
    in_f = in_.reshape(-1)
    valid0_f = valid0.reshape(-1)
    cond = _condensed_slots(out_f, valid0_f, ntype_f, ptr_f)  # [4N] device

    branch = np.nonzero(host_replicated(mesh, ntype_f == _BRANCH))[0].astype(
        np.int64
    )
    alive = np.zeros(N, dtype=bool)
    if len(branch) > 0:
        sel = jnp.asarray(branch)
        slots = (sel * 4)[:, None] + jnp.arange(4, dtype=sel.dtype)
        cond_h = host_replicated(mesh, cond[slots])  # [B,4] — only branch rows cross
        of_node = np.full(N, -1, dtype=np.int64)
        of_node[branch] = np.arange(len(branch))
        tgt = np.where(cond_h >= 0, of_node[np.maximum(cond_h, 0)], -1)
        has_cycle_edge = (cond_h == -2).any(axis=1)
        a = np.ones(len(branch), dtype=bool)
        while True:
            t_alive = (tgt >= 0) & a[np.maximum(tgt, 0)]
            new_a = has_cycle_edge | t_alive.any(axis=1)
            if (new_a == a).all():
                break
            a = new_a
        alive[branch] = a

    v = _final_valid(valid0_f, ntype_f, ptr_f, alive)
    cand = _candidate_mask(
        out_f, in_f, v, mult.reshape(-1), threshold_multiplicity
    )
    return v.reshape(kp, T), cand.reshape(kp, T)


@functools.partial(jax.jit, static_argnames=("mesh", "route_cap"))
def frontier_step(
    mesh: Mesh,
    kmers: jax.Array,  # [kp, T]
    out: jax.Array,  # [kp, 4T] flat
    valid: jax.Array,  # [kp, T]
    frontier: jax.Array,  # int32 [Q] global ids (replicated), -1 dead
    route_cap: int = 1 << 14,
):
    """One distributed BFS expansion: global ids -> all valid out-neighbors.

    Returns int32 [Q, 4] of global neighbor ids (-1 masked).
    """
    kp = mesh.shape["kp"]
    T = kmers.shape[1]

    def step(kmers_l, out_l, valid_l, frontier_l):
        out_l = out_l[0]  # flat [4T]
        valid_l = valid_l[0]
        q = frontier_l
        n = q.shape[0]
        owner = jnp.where(q >= 0, q // T, kp).astype(jnp.int32)
        order = jnp.argsort(owner, stable=True)
        q_sorted = q[order]
        owner_sorted = owner[order]
        bounds = jnp.searchsorted(owner_sorted, jnp.arange(kp + 1, dtype=jnp.int32))
        starts, ends = bounds[:kp], bounds[1:]
        col = jax.lax.broadcasted_iota(jnp.int32, (kp, route_cap), 1)
        idx = starts[:, None] + col
        live = idx < ends[:, None]
        idx_c = jnp.minimum(idx, n - 1)
        send = jnp.where(live, q_sorted[idx_c], -1)

        recv = jax.lax.all_to_all(send[None], "kp", 1, 1, tiled=False)[0]
        flat = recv.reshape(-1)
        loc = jnp.where(flat >= 0, flat % T, 0)
        nbrs = out_l[(loc * 4)[:, None] + jnp.arange(4, dtype=jnp.int32)]  # [kp*cap, 4]
        nb_ok = (flat >= 0)[:, None] & (nbrs >= 0)
        # validity of a GLOBAL neighbor id is owned elsewhere; the caller
        # filters against its replicated valid view
        res = jnp.where(nb_ok, nbrs, -1)
        back = jax.lax.all_to_all(
            res.reshape(kp, route_cap, 4)[None], "kp", 1, 1, tiled=False
        )[0]
        out_sorted = jnp.full((n, 4), -1, dtype=jnp.int32)
        out_sorted = out_sorted.at[
            jnp.where(live, idx_c, n).reshape(-1)
        ].set(back.reshape(-1, 4), mode="drop")
        result = jnp.zeros((n, 4), jnp.int32).at[order].set(out_sorted)
        # filter against the valid mask of the neighbor's owner shard:
        # gather locally over the replicated [kp*T] valid view
        valid_all = jax.lax.all_gather(valid_l, "kp", tiled=True)
        r_ok = (result >= 0) & valid_all[jnp.maximum(result, 0)]
        return jnp.where(r_ok, result, -1)

    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(None, "kp"), P(None, "kp"), P(None, "kp"), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(kmers.reshape(1, -1), out.reshape(1, -1), valid.reshape(1, -1),
              frontier)


def sharded_dbg_to_dbg(sg: ShardedDBG):
    """Compact a ShardedDBG into a single-device ``graph.dbg.DBG``.

    Shards own contiguous sorted k-mer ranges, so the concatenated live
    rows are globally sorted; global ids (shard*T + local) are remapped to
    compact ranks. Used when the distributed build feeds the host-side
    combinatorial stages (the reference pipeline shape: heavy build on the
    mesh, small downstream on one device).
    """
    from mcaat_tpu.graph.dbg import DBG

    kmers, mult, out, valid, in_ = sg.to_single_device()
    live = kmers != int(SENTINEL)
    new_of_old = np.where(live, np.cumsum(live) - 1, -1).astype(np.int32)

    def remap(adj):
        a = adj[live]
        return np.where(a >= 0, new_of_old[np.maximum(a, 0)], -1).astype(np.int32)

    return DBG(
        k=sg.k,
        kmers=jnp.asarray(kmers[live]),
        mult=jnp.asarray(mult[live].astype(np.int32)),
        out=jnp.asarray(remap(out).reshape(-1)),
        in_=jnp.asarray(remap(in_).reshape(-1)),
        valid=jnp.asarray(valid[live]),
    )
