"""Test configuration: CPU backend with 8 virtual devices + fp64.

Correctness tests run in float64 on CPU (matching the reference's fp64
accuracy bars); sharding tests use the 8 virtual devices.  TPU benchmarking
happens in bench.py, not here.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
