from .prune import prune_graph, invalidate_low_multiplicity, clip_tips

__all__ = ["prune_graph", "invalidate_low_multiplicity", "clip_tips"]
