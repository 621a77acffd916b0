"""Synthetic compute-dense chain problem (n up to 16, m up to 4).

Matches the top end of the reference's benchmark grid (reference:
benchmarks/lqr_benchmark.cpp:537-545 — T in {16..128}, n in {4..16},
m in {1..4}): a stable randomly-generated linear system with quadratic
tracking cost and box input constraints, plus a smooth cubic nonlinearity
so the IPM takes genuinely nonlinear Newton steps.  Fixed seed — the
problem is deterministic across processes.

Purpose: a utilization headline case where the per-stage Riccati algebra is
large enough (16x16 blocks) to exercise the MXU rather than the VPU, unlike
the n=4 cartpole.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..model import ModelSpec, box_bounds
from ..types import Dimensions, Topology


def synthetic_chain(horizon: int = 50, state_dim: int = 16,
                    control_dim: int = 4, u_limit: float = 2.0,
                    nonlinearity: float = 0.05, seed: int = 7):
    """Returns (spec, dims, topology, lower, upper, initial_state)."""
    rng = np.random.default_rng(seed)
    n, m = state_dim, control_dim
    A_raw = rng.standard_normal((n, n)).astype(np.float64)
    # scale to spectral radius ~0.95: stable but slow, so the horizon matters
    A_np = 0.95 * A_raw / max(abs(np.linalg.eigvals(A_raw)))
    B_np = rng.standard_normal((n, m)).astype(np.float64) / np.sqrt(n)
    A = jnp.asarray(A_np)
    B = jnp.asarray(B_np)

    def dynamics(x, u, th, i):
        # mild smooth nonlinearity keeps the problem genuinely non-QP
        return A @ x + B @ u + nonlinearity * jnp.tanh(x) * x ** 2 / (
            1.0 + x ** 2)

    def node_cost(x, th, i):
        scale = jnp.where(i == horizon, 10.0, 1.0)
        return 0.5 * scale * jnp.sum(x ** 2)

    def edge_cost(x, u, th, i):
        return 0.05 * jnp.sum(u ** 2)

    spec = ModelSpec(dynamics=dynamics, node_cost=node_cost,
                     edge_cost=edge_cost)
    dims = Dimensions.uniform(num_edges=horizon, state_dim=n,
                              control_dim=m)
    lower, upper = box_bounds(dims, u_lower=-u_limit, u_upper=u_limit)
    x0 = jnp.asarray(rng.uniform(-1.0, 1.0, size=(n,)))
    return spec, dims, Topology.chain(horizon), lower, upper, x0
