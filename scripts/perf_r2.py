"""Post-flat-adjacency TPU measurement batch (single long-lived process)."""
import time
import numpy as np
import mcaat_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def timed(label, fn, *a, iters=3):
    t0 = time.perf_counter()
    r = fn(*a)
    jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, r)
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*a)
        jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, r)
        ts.append(time.perf_counter() - t0)
    print(f"{label:42s} {min(ts)*1e3:8.1f} ms   (compile {compile_s:.1f}s)", flush=True)
    return r


def main():
    from mcaat_tpu.graph.dbg import _join_lookup2, build_dbg_from_reads
    from mcaat_tpu.kmer.count import count_nodes_and_edges
    from mcaat_tpu.graph.dbg import _build_adjacency
    from mcaat_tpu.cycles.start_nodes import _self_reach_kernel

    rng = np.random.default_rng(0)
    R, L = 100_000, 100
    codes = jnp.asarray(rng.integers(0, 4, size=(R, L)).astype(np.uint8))
    lengths = jnp.asarray(np.full(R, L, dtype=np.int32))

    @jax.jit
    def build_step(codes, lengths):
        u23, c23, n23, u24, n24 = count_nodes_and_edges(codes, lengths, 23)
        out, in_ = _build_adjacency(u23, u24, n24)
        return n23, n24, jnp.sum(out >= 0)

    r = timed("build_step (flat adj)", lambda: tuple(int(x) for x in build_step(codes, lengths)))
    nw = R * (L - 22)
    print(f"build kmers/s: {nw/ (0.001*1):.0f} (see ms above)", flush=True)

    # join
    t = jnp.sort(jnp.asarray(rng.integers(0, 1 << 46, size=4_000_000)))
    q1 = jnp.asarray(rng.integers(0, 1 << 46, size=7_800_000))
    q2 = jnp.asarray(rng.integers(0, 1 << 46, size=7_800_000))
    timed("join_lookup2 1-key (4M,2x7.8M)", lambda: [np.asarray(x) for x in _join_lookup2(t, q1, q2)])

    # self-reach on a 2M-node random graph
    N = 2_000_000
    out_adj = rng.integers(0, N, size=(N, 4)).astype(np.int32)
    out_adj[rng.random((N, 4)) < 0.5] = -1
    out_flat = jnp.asarray(out_adj.reshape(-1))
    valid = jnp.ones(N, dtype=bool)
    for B, F in [(512, 64), (2048, 64), (512, 16)]:
        starts = jnp.asarray(rng.integers(0, N, size=B).astype(np.int32))
        timed(f"self_reach B={B} F={F} d=77 N=2M",
              lambda s=starts, f=F: [np.asarray(x) for x in _self_reach_kernel(out_flat, valid, s, 77, f)])

    # scale configs
    for R2, lab in [(100_000, "small 15.6M w"), (400_000, "medium 62M w"), (1_200_000, "large 187M w")]:
        codes2 = rng.integers(0, 4, size=(R2, 100)).astype(np.uint8)
        lengths2 = np.full(R2, 100, dtype=np.int32)
        nwin = 2 * R2 * 78
        g = build_dbg_from_reads(codes2, lengths2)
        t0 = time.perf_counter()
        g = build_dbg_from_reads(codes2, lengths2)
        dt = time.perf_counter() - t0
        ne = int(jnp.sum(g.out >= 0))
        print(f"{lab}: nodes={g.size/1e6:.1f}M edges={ne/1e6:.1f}M time={dt:.2f}s rate={nwin/dt/1e6:.2f}M kmers/s", flush=True)
    print("DONE", flush=True)


main()
