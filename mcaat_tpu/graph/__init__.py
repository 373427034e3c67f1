from .dbg import DBG, build_dbg, build_dbg_from_reads

__all__ = ["DBG", "build_dbg", "build_dbg_from_reads"]
