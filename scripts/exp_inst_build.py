"""TPU experiment: instance-scatter adjacency build vs fused-join build.

Hypothesis: the per-instance node ids that fall out of the counting sort
(one payload-carrying sort) let us scatter adjacency directly — every
edge's endpoints are guaranteed present in the node table (each edge's
prefix/suffix k-window is itself a counted window), so the 24-mer
count_unique AND the fused (key,tag) sort-join are unnecessary work.

Run in ONE process (TPU compiles are slow over the tunnel).
"""

import time

import numpy as np

import mcaat_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from mcaat_tpu.kmer.count import SENTINEL, extract_kmers
from bench import build_step, synth_reads
from mcaat_tpu.graph.dbg import _reverse_complement_batch

K = 23


@jax.jit
def build_inst(codes, lengths):
    """Instance-scatter build: one payload sort + three scatters."""
    rc_codes, rc_lengths = _reverse_complement_batch(codes, lengths)
    codes = jnp.concatenate([codes, rc_codes], axis=0)
    lengths = jnp.concatenate([lengths, rc_lengths], axis=0)
    R, L = codes.shape
    W = L - K + 1
    km = extract_kmers(codes, lengths, K).reshape(-1)  # [I]
    I = km.shape[0]
    orig = jnp.arange(I, dtype=jnp.int32)
    s, so = jax.lax.sort((km, orig), num_keys=1)
    is_head = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    is_head &= s != SENTINEL
    n_unique = jnp.sum(is_head.astype(jnp.int32))
    n_live = jnp.sum((s != SENTINEL).astype(jnp.int32))
    pos = jnp.arange(I, dtype=jnp.int32)
    unique = jnp.sort(jnp.where(is_head, s, SENTINEL))
    head_idx = jnp.sort(jnp.where(is_head, pos, I))
    next_head = jnp.concatenate([head_idx[1:], jnp.array([I], jnp.int32)])
    counts = jnp.where(
        pos < n_unique, jnp.minimum(next_head, n_live) - head_idx, 0
    ).astype(jnp.int32)
    rank = (jnp.cumsum(is_head.astype(jnp.int32)) - 1).astype(jnp.int32)
    # per-instance node id, original (read, pos) order
    inst_id = jnp.zeros((I,), jnp.int32).at[so].set(
        rank, unique_indices=True, mode="promise_in_bounds"
    )
    ids = inst_id.reshape(R, W)
    N = I  # table capacity (padded); real nodes = n_unique
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (R, W - 1), 1)
    live = p_iota < (lengths[:, None] - K)  # v-window at p+1 exists
    u_id = ids[:, :-1]
    v_id = ids[:, 1:]
    b_app = codes[:, K:].astype(jnp.int32)  # appended base of window p
    b_first = codes[:, : W - 1].astype(jnp.int32)
    dump = jnp.int32(4 * N)
    out_slot = jnp.where(live, u_id * 4 + b_app, dump).reshape(-1)
    in_slot = jnp.where(live, v_id * 4 + b_first, dump).reshape(-1)
    out = (
        jnp.full((4 * N + 1,), -1, jnp.int32)
        .at[out_slot]
        .set(jnp.where(live, v_id, -1).reshape(-1), mode="promise_in_bounds")
    )[: 4 * N]
    in_ = (
        jnp.full((4 * N + 1,), -1, jnp.int32)
        .at[in_slot]
        .set(jnp.where(live, u_id, -1).reshape(-1), mode="promise_in_bounds")
    )[: 4 * N]
    return unique, counts, n_unique, out, in_


@jax.jit
def build_inst_sortback(codes, lengths):
    """Variant: rank routed back by a second sort instead of a scatter."""
    rc_codes, rc_lengths = _reverse_complement_batch(codes, lengths)
    codes = jnp.concatenate([codes, rc_codes], axis=0)
    lengths = jnp.concatenate([lengths, rc_lengths], axis=0)
    R, L = codes.shape
    W = L - K + 1
    km = extract_kmers(codes, lengths, K).reshape(-1)
    I = km.shape[0]
    orig = jnp.arange(I, dtype=jnp.int32)
    s, so = jax.lax.sort((km, orig), num_keys=1)
    is_head = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    is_head &= s != SENTINEL
    n_unique = jnp.sum(is_head.astype(jnp.int32))
    rank = (jnp.cumsum(is_head.astype(jnp.int32)) - 1).astype(jnp.int32)
    _, inst_id = jax.lax.sort((so, rank), num_keys=1)
    ids = inst_id.reshape(R, W)
    N = I
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (R, W - 1), 1)
    live = p_iota < (lengths[:, None] - K)
    u_id = ids[:, :-1]
    v_id = ids[:, 1:]
    b_app = codes[:, K:].astype(jnp.int32)
    b_first = codes[:, : W - 1].astype(jnp.int32)
    dump = jnp.int32(4 * N)
    out_slot = jnp.where(live, u_id * 4 + b_app, dump).reshape(-1)
    in_slot = jnp.where(live, v_id * 4 + b_first, dump).reshape(-1)
    out = (
        jnp.full((4 * N + 1,), -1, jnp.int32)
        .at[out_slot]
        .set(jnp.where(live, v_id, -1).reshape(-1), mode="promise_in_bounds")
    )[: 4 * N]
    in_ = (
        jnp.full((4 * N + 1,), -1, jnp.int32)
        .at[in_slot]
        .set(jnp.where(live, u_id, -1).reshape(-1), mode="promise_in_bounds")
    )[: 4 * N]
    return n_unique, out, in_


def timed(name, fn, *a, iters=3):
    t0 = time.perf_counter()
    r = fn(*a)
    jax.tree.map(lambda x: np.asarray(x).ravel()[:1] if getattr(x, "ndim", 0) else int(x), r)
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
        jax.tree.map(lambda x: np.asarray(x).ravel()[:1] if getattr(x, "ndim", 0) else int(x), r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<28} {dt*1000:9.1f} ms  (compile {c:.1f}s)", flush=True)
    return r, dt


def main():
    codes, lengths = synth_reads(100_000, 100)
    n_windows = 100_000 * (100 - K + 1)

    r_cur, dt_cur = timed("build_step (join, current)", build_step, codes, lengths)
    r_new, dt_new = timed("build_inst (scatter)", build_inst, codes, lengths)
    r_sb, dt_sb = timed("build_inst (sortback)", build_inst_sortback, codes, lengths)

    print(f"current: {n_windows/dt_cur/1e6:.2f}M kmers/s", flush=True)
    print(f"inst   : {n_windows/dt_new/1e6:.2f}M kmers/s", flush=True)
    print(f"sortbk : {n_windows/dt_sb/1e6:.2f}M kmers/s", flush=True)

    # correctness: compare against the current build on a small input
    from mcaat_tpu.graph.dbg import build_dbg_from_reads

    c2, l2 = synth_reads(2_000, 100, seed=7)
    g = build_dbg_from_reads(np.asarray(c2), np.asarray(l2), bucket_shapes=False)
    u, cnt, nu, out, in_ = build_inst(c2, l2)
    nu = int(nu)
    ok_nodes = bool(
        (np.asarray(u[:nu]) == np.asarray(g.kmers[: g.size])[: nu]).all()
    ) and nu == g.size
    ok_mult = bool((np.asarray(cnt[:nu]) == np.asarray(g.mult)).all())
    out_np = np.asarray(out[: 4 * nu])
    in_np = np.asarray(in_[: 4 * nu])
    ok_out = bool((out_np == np.asarray(g.out)).all())
    ok_in = bool((in_np == np.asarray(g.in_)).all())
    print(f"parity nodes={ok_nodes} mult={ok_mult} out={ok_out} in={ok_in}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
