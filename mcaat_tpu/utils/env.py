"""Environment plumbing.

Some TPU containers install a ``sitecustomize`` that force-selects the
TPU platform via ``jax.config.update("jax_platforms", ...)`` at
interpreter startup, overriding the ``JAX_PLATFORMS`` env var. Tests and
the multi-chip dry-run rely on ``JAX_PLATFORMS=cpu`` plus
``--xla_force_host_platform_device_count=N`` to simulate an N-device
mesh; this helper re-asserts the env's intent before any backend is
initialized.
"""

from __future__ import annotations

import os
import re


def honor_cpu_env() -> None:
    """If the env requests the CPU platform, make JAX actually use it."""
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if "cpu" not in platforms.split(","):
        return
    import jax

    try:
        jax.config.update("jax_platforms", platforms)
    except RuntimeError:
        pass  # backend already initialized; nothing to do
    m = re.search(
        r"xla_force_host_platform_device_count=(\d+)",
        os.environ.get("XLA_FLAGS", ""),
    )
    if m:
        try:
            jax.config.update("jax_num_cpu_devices", int(m.group(1)))
        except RuntimeError:
            pass
