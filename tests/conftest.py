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
# Keep CHILD processes (subprocess sharding/multiprocess tests) off the TPU
# tunnel entirely: with PALLAS_AXON_POOL_IPS unset, sitecustomize skips
# axon registration, so a test subprocess can never initialize the axon
# backend and hold the tunnel's SERIALIZED client session (a held session
# blocks any concurrent TPU user's first device op for minutes — measured
# 157-335 s; see bench.py session_acquire_s).  For THIS process the
# registration already ran (sitecustomize precedes conftest), but the
# config-level cpu switch below keeps the axon backend uninitialized,
# which verified-ly does not grab a session.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
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
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
