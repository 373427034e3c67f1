"""Stage-boundary checkpoint/resume.

The reference's only checkpoint is the graph round-trip through
``output/graph/graph.sdbg.*`` (loaded back at src/main.cpp:517-530 and
deleted at the end), plus dev helpers for cycles/paths. Here every stage
boundary is a serializable artifact (SURVEY §5): the graph's
structure-of-arrays goes to one ``.npz``, cycles/reads/systems to JSON —
so each stage is independently resumable and testable, mirroring the
reference's ``graph/`` and ``cycles/`` folder layout (src/main.cpp:245-250).
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from mcaat_tpu.graph.dbg import DBG


def save_graph(path: str, graph: DBG) -> None:
    """Persist the graph arrays (the analog of graph.sdbg.*)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(
        path,
        k=np.int32(graph.k),
        kmers=np.asarray(graph.kmers),
        mult=np.asarray(graph.mult),
        out=np.asarray(graph.out),
        in_=np.asarray(graph.in_),
        valid=np.asarray(graph.valid),
    )


def load_graph(path: str) -> DBG:
    """≙ SDBG::LoadFromFile."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    # adjacency is flat [4N] on device; reshape(-1) also accepts archives
    # written by older [N,4] builds
    return DBG(
        k=int(data["k"]),
        kmers=jnp.asarray(data["kmers"]),
        mult=jnp.asarray(data["mult"]),
        out=jnp.asarray(data["out"].reshape(-1)),
        in_=jnp.asarray(data["in_"].reshape(-1)),
        valid=jnp.asarray(data["valid"]),
    )


def save_cycles(path: str, cycles_map: dict[int, list[list[int]]]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        json.dump({str(k): v for k, v in cycles_map.items()}, fh)


def load_cycles(path: str) -> dict[int, list[list[int]]]:
    with open(path) as fh:
        j = json.load(fh)
    return {int(k): [[int(x) for x in c] for c in v] for k, v in j.items()}


def save_reads(path: str, reads: list[list[int]]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        json.dump(reads, fh)


def load_reads(path: str) -> list[list[int]]:
    with open(path) as fh:
        return [[int(x) for x in r] for r in json.load(fh)]


def save_systems(path: str, found_systems) -> None:
    from mcaat_tpu.pipeline import FoundSystem

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        json.dump(
            [
                {
                    "full_sequence": fs.full_sequence,
                    "repeat": fs.repeat,
                    "spacers": fs.spacers,
                    "confidence_cycle_resolution": fs.confidence_cycle_resolution,
                    "confidence_topological_sort": fs.confidence_topological_sort,
                }
                for fs in found_systems
            ],
            fh,
        )


def load_systems(path: str):
    from mcaat_tpu.pipeline import FoundSystem

    with open(path) as fh:
        data = json.load(fh)
    return [
        FoundSystem(
            d["full_sequence"],
            d["repeat"],
            d["spacers"],
            d["confidence_cycle_resolution"],
            d["confidence_topological_sort"],
        )
        for d in data
    ]
