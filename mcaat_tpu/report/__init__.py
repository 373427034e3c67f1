from .analyzer import CRISPRAnalyzer
from .fuzz import ratio, partial_ratio

__all__ = ["CRISPRAnalyzer", "ratio", "partial_ratio"]
