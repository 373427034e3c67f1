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


# ---------------------------------------------------------------------------
# Sharded-graph checkpoints (per-shard files; no replication through host)
# ---------------------------------------------------------------------------


def _addressable_rows(arr) -> dict[int, np.ndarray]:
    """{kp row -> host block} of a [kp, ...] P("kp", None)-sharded array,
    deduped across dp replicas. Each process sees only its own rows."""
    rows: dict[int, np.ndarray] = {}
    for sh in arr.addressable_shards:
        r = sh.index[0].start or 0
        if r not in rows:
            rows[r] = np.asarray(sh.data)
    return rows


def save_sharded_graph(dir_path: str, sg) -> None:
    """Persist a ShardedDBG: one ``shard_XXXX.npz`` per kp shard plus a
    ``meta.json``. Each PROCESS writes only the shards it addresses, so a
    multi-host graph checkpoints without ever being replicated (the r3
    checkpoint path forced single-device compaction — capping resumable
    runs at single-chip scale, exactly the runs long enough to need
    resume)."""
    import jax

    os.makedirs(dir_path, exist_ok=True)
    kp, T = sg.kmers.shape
    km = _addressable_rows(sg.kmers)
    mu = _addressable_rows(sg.mult)
    ou = _addressable_rows(sg.out)
    inn = _addressable_rows(sg.in_)
    va = _addressable_rows(sg.valid)
    for r in km:
        np.savez_compressed(
            os.path.join(dir_path, f"shard_{r:04d}.npz"),
            kmers=km[r], mult=mu[r], out=ou[r], in_=inn[r], valid=va[r],
        )
    if jax.process_index() == 0:
        meta = {
            "k": int(sg.k),
            "kp": int(kp),
            "T": int(T),
            "route_cap": int(sg.route_cap),
            "n_live": [] if sg.n_live is None else [int(x) for x in sg.n_live],
        }
        with open(os.path.join(dir_path, "meta.json"), "w") as fh:
            json.dump(meta, fh)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mcaat_ckpt_sharded_graph")


def _load_sharded_field(dir_path: str, mesh, name: str, shape):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    cache: dict[int, np.lib.npyio.NpzFile] = {}

    def cb(index):
        r = index[0].start or 0
        if r not in cache:
            cache[r] = np.load(os.path.join(dir_path, f"shard_{r:04d}.npz"))
        return cache[r][name]

    return jax.make_array_from_callback(
        shape, NamedSharding(mesh, P("kp", None)), cb
    )


def load_sharded_graph(dir_path: str, mesh):
    """Rebuild a ShardedDBG on ``mesh`` from :func:`save_sharded_graph`
    files; each process reads only the shards its devices own. The mesh's
    kp extent must match the checkpoint (the k-mer-space partition is
    baked into the shard files)."""
    from mcaat_tpu.parallel.sharded_graph import ShardedDBG

    with open(os.path.join(dir_path, "meta.json")) as fh:
        meta = json.load(fh)
    kp, T = meta["kp"], meta["T"]
    if mesh.shape["kp"] != kp:
        raise ValueError(
            f"checkpoint has kp={kp}, mesh has kp={mesh.shape['kp']}"
        )
    return ShardedDBG(
        k=int(meta["k"]),
        mesh=mesh,
        kmers=_load_sharded_field(dir_path, mesh, "kmers", (kp, T)),
        mult=_load_sharded_field(dir_path, mesh, "mult", (kp, T)),
        out=_load_sharded_field(dir_path, mesh, "out", (kp, 4 * T)),
        in_=_load_sharded_field(dir_path, mesh, "in_", (kp, 4 * T)),
        valid=_load_sharded_field(dir_path, mesh, "valid", (kp, T)),
        route_cap=int(meta.get("route_cap", 0)),
        n_live=(
            np.asarray(meta["n_live"], dtype=np.int64)
            if meta.get("n_live")
            else None
        ),
    )


def save_sharded_valid(dir_path: str, mesh, valid) -> None:
    """Per-shard post-prune validity mask (the cycle stage's second
    output next to cycles.json)."""
    import jax

    os.makedirs(dir_path, exist_ok=True)
    for r, block in _addressable_rows(valid).items():
        np.savez_compressed(
            os.path.join(dir_path, f"shard_{r:04d}.npz"), valid=block
        )
    if jax.process_index() == 0:
        with open(os.path.join(dir_path, "meta.json"), "w") as fh:
            json.dump({"kp": int(valid.shape[0]), "T": int(valid.shape[1])}, fh)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mcaat_ckpt_sharded_valid")


def load_sharded_valid(dir_path: str, mesh):
    with open(os.path.join(dir_path, "meta.json")) as fh:
        meta = json.load(fh)
    kp, T = meta["kp"], meta["T"]
    if mesh.shape["kp"] != kp:
        raise ValueError(
            f"checkpoint has kp={kp}, mesh has kp={mesh.shape['kp']}"
        )
    return _load_sharded_field(dir_path, mesh, "valid", (kp, T))


def save_cycles(path: str, cycles_map: dict[int, list[list[int]]]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        json.dump({str(k): v for k, v in cycles_map.items()}, fh)


def load_cycles(path: str) -> dict[int, list[list[int]]]:
    with open(path) as fh:
        j = json.load(fh)
    return {int(k): [[int(x) for x in c] for c in v] for k, v in j.items()}


def save_reads(path: str, reads) -> None:
    """``reads`` is a ``Chains`` (or list of lists); the JSON artifact
    stays list-of-lists for cross-round compatibility."""
    from mcaat_tpu.reads.chains import Chains

    if isinstance(reads, Chains):
        reads = reads.tolists()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        json.dump(reads, fh)


def load_reads(path: str):
    from mcaat_tpu.reads.chains import Chains

    with open(path) as fh:
        return Chains.from_lists([[int(x) for x in r] for r in json.load(fh)])


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
