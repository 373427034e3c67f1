from .extract import get_systems

__all__ = ["get_systems"]
