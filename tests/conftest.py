"""Test harness config: force CPU with 8 virtual devices.

Multi-chip logic is validated on a virtual device mesh (the analog of testing
multi-node collectives without a cluster); Pallas kernels run in interpret
mode. Must run before any test imports jax. Note: the axon TPU plugin
overrides the JAX_PLATFORMS env var, so the platform is forced via
jax.config as well.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unityraytracer_tpu.utils.compcache import enable_persistent_cache  # noqa: E402

# CPU test compiles are plentiful and deterministic — cache them across runs.
enable_persistent_cache()
