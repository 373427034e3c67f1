"""Repro #2: exact e2e dataset, staged prune with progressive prints."""

import sys
import time

sys.path.insert(0, "tests")

import numpy as np

import mcaat_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from synthetic import make_metagenome, write_fastq
from mcaat_tpu.pipeline import build_graph_from_settings
from mcaat_tpu.settings import Settings
from mcaat_tpu.prune.prune import (
    _clip_tips_fixpoint,
    invalidate_low_multiplicity,
)


def main():
    meta = make_metagenome(
        seed=123, n_arrays=40, n_spacers=6, background_len=200_000,
        background_coverage=8.0, coverage=35.0,
    )
    write_fastq("/tmp/e2e_reads.fq", meta["reads"])
    s = Settings(input_files="/tmp/e2e_reads.fq")
    t0 = time.time()
    g = build_graph_from_settings(s)
    print(f"graph: {g.size} nodes ({time.time()-t0:.1f}s)", flush=True)

    g, n_mult = invalidate_low_multiplicity(g)
    print(f"mult<=1 invalidated: {n_mult}", flush=True)

    print("fixpoint (while_loop) ...", flush=True)
    t0 = time.time()
    try:
        new_valid = _clip_tips_fixpoint(g.out, g.valid)
        n = int(jnp.sum(new_valid))
        print(f"fixpoint ok: valid={n} ({time.time()-t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"fixpoint CRASHED after {time.time()-t0:.1f}s: {e!r}", flush=True)
        # host-stepped alternative: one jitted step per dispatch
        @jax.jit
        def step(out, valid):
            from mcaat_tpu.graph.dbg import _degree

            outdeg = _degree(out, valid)
            tips = valid & (outdeg == 0)
            return valid & ~tips, jnp.sum(tips.astype(jnp.int32))

        t0 = time.time()
        valid = g.valid
        it = 0
        while True:
            valid, n_tips = step(g.out, valid)
            it += 1
            if int(n_tips) == 0:
                break
        print(
            f"host-stepped ok: iters={it} valid={int(jnp.sum(valid))} "
            f"({time.time()-t0:.1f}s)",
            flush=True,
        )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
