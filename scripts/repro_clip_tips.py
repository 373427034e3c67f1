"""Reproduce the TPU worker crash in clip_tips at the e2e shape.

e2e (30200 reads x 150bp, bucketed to 32768 rows; graph bucketed to
524288 nodes) crashed twice in prune.clip_tips with "TPU worker process
crashed or restarted". Bisect: build the same-shape graph from random
reads, then run each prune piece separately.
"""

import sys
import time

import numpy as np

import mcaat_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from mcaat_tpu.graph.dbg import build_dbg_from_reads
from mcaat_tpu.prune.prune import (
    _clip_tips_fixpoint,
    clip_tips,
    invalidate_low_multiplicity,
)


def main():
    rng = np.random.default_rng(0)
    R, L = 30_200, 150
    codes = rng.integers(0, 4, size=(R, L)).astype(np.uint8)
    lengths = np.full(R, L, dtype=np.int32)
    t0 = time.time()
    g = build_dbg_from_reads(codes, lengths)
    print(f"graph: {g.size} nodes ({time.time()-t0:.1f}s)", flush=True)

    t0 = time.time()
    tips0 = int(jnp.sum(g.valid & (g.out_degree() == 0)))
    print(f"tips0={tips0} ({time.time()-t0:.1f}s)", flush=True)

    g, n_mult = invalidate_low_multiplicity(g)
    print(f"mult<=1 invalidated: {n_mult}", flush=True)

    print("running _clip_tips_fixpoint ...", flush=True)
    t0 = time.time()
    new_valid = _clip_tips_fixpoint(g.out, g.valid)
    n = int(jnp.sum(new_valid))
    print(f"fixpoint ok: valid={n} ({time.time()-t0:.1f}s)", flush=True)

    print("running clip_tips wrapper ...", flush=True)
    g2, n_tips = clip_tips(g)
    print(f"clip_tips ok: clipped={n_tips}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
