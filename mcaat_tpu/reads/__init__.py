from .mapper import get_reads, map_reads_to_nodes

__all__ = ["get_reads", "map_reads_to_nodes"]
