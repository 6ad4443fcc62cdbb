"""Test harness config: force CPU with 8 virtual devices.

Multi-chip logic is validated on a virtual device mesh (the analog of testing
multi-node collectives without a cluster); kernels run in interpret mode.
Must run before any jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
