"""One-process TPU perf sweep (run in background; compiles are slow over
the tunnel, so everything is batched here)."""

import time

import numpy as np

import mcaat_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from mcaat_tpu.kmer.count import count_unique, extract_kmers
# (pallas extraction kernel removed: Mosaic cannot compile 64-bit kernels)
from mcaat_tpu.graph.dbg import _build_adjacency, _lookup


def timed(name, fn, *a, iters=3):
    t0 = time.perf_counter()
    r = fn(*a)
    jax.tree.map(lambda x: np.asarray(x[..., :1]) if getattr(x, "ndim", 0) else float(x), r)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
        jax.tree.map(
            lambda x: np.asarray(x[..., :1]) if getattr(x, "ndim", 0) else float(x), r
        )
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<36} {dt*1000:9.1f} ms   (compile {compile_s:.1f}s)", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    R, L = 100_000, 100
    codes = jnp.asarray(rng.integers(0, 4, size=(R, L)).astype(np.uint8))
    lengths = jnp.asarray(np.full(R, L, dtype=np.int32))
    n_windows = R * (L - 23 + 1)
    print(f"reads={R} len={L} windows={n_windows/1e6:.1f}M", flush=True)

    ex23 = jax.jit(lambda c, l: extract_kmers(c, l, 23))
    ex24 = jax.jit(lambda c, l: extract_kmers(c, l, 24))
    timed("extract23 XLA", ex23, codes, lengths)
    timed("extract24 XLA", ex24, codes, lengths)

    km23 = ex23(codes, lengths).reshape(-1)
    km24 = ex24(codes, lengths).reshape(-1)
    timed("count_unique 7.8M", count_unique, km23)
    u23, c23, n23 = count_unique(km23)
    u24, c24, n24 = count_unique(km24)
    timed("build_adjacency", _build_adjacency, u23, u24, n24)
    timed("lookup 7.7M (sorted queries)", _lookup, u23, u24 >> jnp.int64(2))
    qs = jnp.sort(km23)  # worst-case realistic bulk lookup
    timed("lookup 7.8M instances", _lookup, u23, km23)

    # full build comparison
    from bench import build_step

    dt = timed("build_step (current)", build_step, codes, lengths)
    print(f"build_step kmers/s: {n_windows/dt/1e6:.2f}M", flush=True)

    # batched DLS throughput on a CRISPR-like synthetic graph: most
    # candidates sit on short cycles (arrays), some on long paths (reject)
    from mcaat_tpu.cycles.start_nodes import _self_reach_kernel

    N = 2_000_000
    out = np.full((N, 4), -1, dtype=np.int32)
    # chains of length 64 with a closing edge on even chains (cycle) and
    # none on odd chains (path)
    span = 64
    base = np.arange(N, dtype=np.int32)
    out[:, 0] = np.where((base + 1) % span != 0, base + 1, -1)
    chain_id = base // span
    closers = base[(base % span == span - 1) & (chain_id % 2 == 0)]
    out[closers, 0] = closers - (span - 1)
    valid = np.ones(N, dtype=bool)
    out_j = jnp.asarray(out)
    valid_j = jnp.asarray(valid)
    B = 512
    starts = jnp.asarray((rng.integers(0, N // span, size=B) * span).astype(np.int32))
    fn = lambda o, v, s: _self_reach_kernel(o, v, s, 77, 256)
    dt = timed("self_reach B=512 d=77 N=2M", fn, out_j, valid_j, starts)
    print(f"DLS candidates/s: {B/dt:,.0f}  (reference scan ~133k nodes/s incl. rejects)", flush=True)
    f, ov = fn(out_j, valid_j, starts)
    exp = (np.asarray(starts) // span) % 2 == 0
    print("DLS correctness:", bool((np.asarray(f) == exp).all()), "overflow:", int(np.asarray(ov).sum()), flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
