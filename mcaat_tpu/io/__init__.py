from .fastq import (
    read_sequences,
    encode_sequences,
    reverse_complement,
    ReadBatch,
)

__all__ = ["read_sequences", "encode_sequences", "reverse_complement", "ReadBatch"]
