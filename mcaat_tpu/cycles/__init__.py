from .finder import CycleFinder, find_cycles
from .start_nodes import select_start_nodes, self_reachable_batch

__all__ = ["CycleFinder", "find_cycles", "select_start_nodes", "self_reachable_batch"]
