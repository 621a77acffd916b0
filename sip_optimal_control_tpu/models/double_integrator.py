"""Double-integrator LQR benchmark model (BASELINE config 1; the problem
family of the reference's chain benchmarks, lqr_benchmark.cpp:47-99)."""

from __future__ import annotations

import jax.numpy as jnp

from ..model import ModelSpec
from ..types import Dimensions, Topology


def double_integrator(horizon: int = 20, dt: float = 0.1, q: float = 1.0,
                      r: float = 0.1, qf: float = 10.0):
    """Returns (spec, dims, topology).  2 states (pos, vel), 1 control."""
    A = jnp.asarray([[1.0, dt], [0.0, 1.0]])
    B = jnp.asarray([[0.5 * dt * dt], [dt]])

    spec = ModelSpec(
        dynamics=lambda x, u, th, i: A @ x + B @ u,
        node_cost=lambda x, th, i: 0.5 * jnp.where(i == horizon, qf, q)
        * jnp.sum(x ** 2),
        edge_cost=lambda x, u, th, i: 0.5 * r * jnp.sum(u ** 2),
    )
    dims = Dimensions.uniform(num_edges=horizon, state_dim=2, control_dim=1)
    return spec, dims, Topology.chain(horizon)
