"""Cycle-search stage micro-timings on the e2e graph (one TPU process)."""

import sys
import time

sys.path.insert(0, "tests")

import numpy as np

import mcaat_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from synthetic import make_metagenome, write_fastq
from mcaat_tpu.settings import Settings
from mcaat_tpu.pipeline import build_graph_from_settings
from mcaat_tpu.prune.prune import prune_graph
from mcaat_tpu.cycles.start_nodes import _candidate_mask, select_start_nodes, self_reachable_batch


def main():
    meta = make_metagenome(seed=123, n_arrays=40, n_spacers=6, background_len=200_000,
                           background_coverage=8.0, coverage=35.0)
    write_fastq("/tmp/e2e_reads.fq", meta["reads"])
    s = Settings(input_files="/tmp/e2e_reads.fq")
    t0 = time.time(); g = build_graph_from_settings(s); print(f"build {time.time()-t0:.2f}s", flush=True)
    for it in range(3):
        t0 = time.time()
        g2 = prune_graph(g, verbose=False)
        print(f"prune[{it}] {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    cand_mask = _candidate_mask(g2.out, g2.in_, g2.valid, g2.mult, 20)
    cand = np.nonzero(np.asarray(cand_mask))[0].astype(np.int32)
    print(f"candidate scan {time.time()-t0:.2f}s  n={len(cand)}", flush=True)
    for it in range(3):
        t0 = time.time()
        reach = self_reachable_batch(g2, cand, 77)
        print(f"self_reach[{it}] {time.time()-t0:.2f}s  kept={int(reach.sum())}", flush=True)
    t0 = time.time()
    buckets = select_start_nodes(g2, 20, 77, verbose=False)
    print(f"select_start_nodes {time.time()-t0:.2f}s", flush=True)
    from mcaat_tpu.cycles.finder import find_cycles
    t0 = time.time()
    _g3, cm = find_cycles(g, verbose=False)
    print(f"find_cycles total {time.time()-t0:.2f}s  starts={len(cm)}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
