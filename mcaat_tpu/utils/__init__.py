from .env import honor_cpu_env

__all__ = ["honor_cpu_env"]
