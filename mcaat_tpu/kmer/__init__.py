from .count import extract_kmers, count_unique, count_kmers_for_reads

__all__ = ["extract_kmers", "count_unique", "count_kmers_for_reads"]
