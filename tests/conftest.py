"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware.

Note: the TPU container's sitecustomize force-selects the TPU platform
via jax.config, overriding JAX_PLATFORMS — honor_cpu_env() undoes that.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

from mcaat_tpu.utils.env import honor_cpu_env  # noqa: E402

honor_cpu_env()
