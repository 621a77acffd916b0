"""Shared-parameter scenario family for the coupled joint-theta solve.

S double-integrator scenarios, each from its own initial state, share ONE
global setpoint parameter theta that every node cost pulls toward: the
joint optimum balances theta across all scenarios, so the theta Schur
complement genuinely couples every scenario block (SURVEY 2.10(c); the
per-solve reference math is helpers.cpp:376-407).  Used by
parallel.solve_joint_theta benchmarks/tests — scenario lanes live on the
vmap/mesh axes, so this module returns the single-scenario pieces.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..model import ModelSpec, box_bounds
from ..types import Dimensions, Topology


def shared_theta_chain(horizon: int = 20, dt: float = 0.1,
                       u_limit: float = 2.0, q_vel: float = 0.05,
                       r_u: float = 0.05, w_theta: float = 1.0):
    """Returns (spec, dims, topology, lower, upper) — initial states are
    per-scenario and supplied by the driver."""

    def dynamics(x, u, th, i):
        return jnp.stack([x[0] + dt * x[1], x[1] + dt * u[0]])

    def node_cost(x, th, i):
        return 0.5 * w_theta * (x[0] - th[0]) ** 2 + 0.5 * q_vel * x[1] ** 2

    def edge_cost(x, u, th, i):
        return 0.5 * r_u * u[0] ** 2

    spec = ModelSpec(dynamics=dynamics, node_cost=node_cost,
                     edge_cost=edge_cost)
    dims = Dimensions.uniform(num_edges=horizon, state_dim=2,
                              control_dim=1, theta_dim=1)
    lower, upper = box_bounds(dims, u_lower=-u_limit, u_upper=u_limit)
    return spec, dims, Topology.chain(horizon), lower, upper
