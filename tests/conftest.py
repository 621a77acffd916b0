"""Test configuration: CPU backend with 8 virtual devices + fp64.

Correctness tests run in float64 on CPU (matching the reference's fp64
accuracy bars); sharding tests use the 8 virtual devices.  TPU benchmarking
happens in bench.py, not here.
"""

import os

# Force CPU: the ambient environment sets JAX_PLATFORMS=axon (remote TPU
# tunnel with remote compile), which makes fp64 correctness tests impossible
# and compiles intermittently slow.  Benchmarks use the TPU; tests use CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
# NOTE: --xla_force_host_platform_device_count is deliberately NOT set here:
# it slows every XLA:CPU compile ~7x.  Sharding tests (test_sharding.py)
# spawn a subprocess that sets it for themselves.

import jax  # noqa: E402

# sitecustomize.py (from PYTHONPATH) registers the axon TPU PJRT plugin and
# imports jax before conftest runs, so set the platform at config level too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: XLA-CPU compiles of scan+cholesky programs are
# slow; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
