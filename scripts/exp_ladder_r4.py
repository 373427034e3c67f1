"""Measure the coarse bucket ladder's program-count reduction (VERDICT r3
next #8).

Two datasets whose node counts land in DIFFERENT fine-ladder tiers of
the same octave (~1.05M and ~1.45M nodes) but the SAME coarse-ladder
tier (1.5 x 2^20). For each ladder mode (subprocess env
MCAAT_COARSE_BUCKET_MIN: huge = fine everywhere, 1<<20 = coarse at these
sizes) build A, snapshot the compile counter, build B, and report how
many fresh XLA programs B compiled. Under the coarse ladder every
table-shaped program (bucket-slice, merge, derive, adjacency, degree...)
is shared with A, so B's compile set should collapse to the handful of
row-shaped extraction programs.

CPU-only (the ladder logic is backend-independent; at production 64M+
sizes each avoided program costs 1-500s through the remote-compile
service). Usage: python scripts/exp_ladder_r4.py
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys
sys.path.insert(0, %(repo)r)
from mcaat_tpu.utils.env import honor_cpu_env
honor_cpu_env()
import numpy as np
from mcaat_tpu.utils.profiling import compile_counter
cc = compile_counter()
from mcaat_tpu.graph.dbg import build_dbg_from_reads, _bucket_size

def build(genome_len, seed):
    # coverage-sampled reads (nodes ~= genome_len << windows): uniform
    # random reads make nodes ~= edges, which clamps the node table to
    # the derive output's exact width (an unbucketed shape) and breaks
    # sharing regardless of ladder — not the production shape profile
    r = np.random.default_rng(seed)
    genome = r.integers(0, 4, size=genome_len).astype(np.uint8)
    n_reads = int(genome_len * 5 / 93)
    starts = r.integers(0, genome_len - 93, size=n_reads)
    codes = genome[starts[:, None] + np.arange(93)]
    lengths = np.full(n_reads, 93, dtype=np.int32)
    g = build_dbg_from_reads(codes, lengths, k=23,
                             add_reverse_complement=False)
    import numpy as _np
    return int(_np.asarray(g.valid).sum())

nA = build(1_100_000, 1)   # ~1.1M nodes: fine tier 1.25x2^20, coarse 1.5x
snap = cc.snapshot()
nB = build(1_400_000, 2)   # ~1.4M nodes: fine tier 1.5x2^20 (fresh), coarse 1.5x (shared)
d_count, d_secs = cc.delta(snap)
print("LADDER_RESULT " + repr((nA, _bucket_size(nA), nB, _bucket_size(nB),
                               d_count, round(d_secs, 2))))
"""


def run(mode: str, coarse_min: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["MCAAT_COARSE_BUCKET_MIN"] = str(coarse_min)
    res = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO}],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    for line in res.stdout.splitlines():
        if line.startswith("LADDER_RESULT "):
            nA, bA, nB, bB, d_count, d_secs = eval(line.split(" ", 1)[1])
            return {
                "mode": mode, "nodes_A": nA, "bucket_A": bA,
                "nodes_B": nB, "bucket_B": bB,
                "fresh_programs_for_B": d_count,
                "compile_seconds_for_B": d_secs,
            }
    print(res.stdout[-3000:])
    print(res.stderr[-3000:])
    raise SystemExit(f"{mode}: no result line")


def main():
    fine = run("fine", 1 << 62)
    coarse = run("coarse", 1 << 20)
    out = {"fine": fine, "coarse": coarse,
           "reduction": f"{fine['fresh_programs_for_B']} -> "
                        f"{coarse['fresh_programs_for_B']} fresh programs "
                        "for the second dataset of the octave"}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
