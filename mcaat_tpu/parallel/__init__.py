from .sharded import (
    make_pipeline_mesh,
    sharded_count_kmers,
    sharded_lookup,
    sharded_pipeline_step,
)

__all__ = [
    "make_pipeline_mesh",
    "sharded_count_kmers",
    "sharded_lookup",
    "sharded_pipeline_step",
]
