"""Multi-device scenario sharding (BASELINE config 5).

The reference is single-threaded C++ with no distribution (SURVEY 2.10);
scale-out here is TPU-native: scenarios are data-parallel across a
`jax.sharding.Mesh` axis via `shard_map`, each device vmapping its local
shard of interior-point solves, with XLA collectives (`psum`) only for
cross-scenario aggregates.  Multi-host runs use the same code over a pod
slice (mesh built from all devices after `jax.distributed.initialize`);
ICI/DCN routing is XLA's job.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:                                    # jax >= 0.7 public API
    from jax import shard_map
except ImportError:                     # older jax
    from jax.experimental.shard_map import shard_map

from ..model import ModelSpec, build_problem
from ..solver.settings import Settings
from ..solver.sip import solve
from ..types import Dimensions, Topology


class BatchSolveStats(NamedTuple):
    """Cross-scenario aggregates computed with collectives."""

    total_solved: jax.Array
    max_kkt_error: jax.Array
    mean_iterations: jax.Array


def scenario_mesh(devices: Optional[Sequence] = None,
                  axis_name: str = "scenario") -> Mesh:
    devices = jax.devices() if devices is None else list(devices)
    return Mesh(np.asarray(devices), (axis_name,))


def shard_scenarios(arr: jax.Array, mesh: Mesh,
                    axis_name: str = "scenario") -> jax.Array:
    """Place a [B, ...] batch with B sharded over the mesh axis."""
    return jax.device_put(arr, NamedSharding(mesh, P(axis_name)))


def solve_batch_sharded(spec: ModelSpec, dims: Dimensions,
                        topology: Topology, x0s: jax.Array,
                        settings: Optional[Settings] = None,
                        mesh: Optional[Mesh] = None,
                        axis_name: str = "scenario", lower=None, upper=None):
    """Solve a batch of scenarios sharded across devices.

    Returns (controls [B, E, m], statuses [B], stats) where `stats` holds
    psum/pmean cross-scenario reductions — the collective pattern that
    robust-MPC couplings and global metrics ride on.
    """
    settings = settings or Settings()
    mesh = mesh or scenario_mesh(axis_name=axis_name)

    def solve_one(x0):
        problem = build_problem(spec, dims, topology, initial_state=x0,
                                lower=lower, upper=upper)
        return solve(problem, settings)

    def shard_fn(x0_local):
        res = jax.vmap(solve_one)(x0_local)
        solved = jnp.sum((res.status == 0).astype(jnp.int32))
        stats = BatchSolveStats(
            total_solved=jax.lax.psum(solved, axis_name),
            max_kkt_error=jax.lax.pmax(jnp.max(res.kkt_error), axis_name),
            mean_iterations=jax.lax.pmean(
                jnp.mean(res.iterations.astype(jnp.float32)), axis_name))
        return res.vars.u, res.status, stats

    fn = shard_map(
        shard_fn, mesh=mesh, in_specs=(P(axis_name),),
        out_specs=(P(axis_name), P(axis_name), P()))
    return fn(x0s)
