"""Robust MPC over a scenario tree (BASELINE config 5's problem class).

A double integrator with an uncertain constant disturbance: the first
`t_shared` stages are common to all futures (non-anticipativity is
structural — they are literally shared tree nodes), then the tree branches
into `n_branches` scenarios, each a chain of `t_branch` stages under its
own disturbance realization.  Branch stage costs are weighted by the
scenario probability 1/S, so the solve minimizes expected cost — the
canonical scenario-tree robust MPC formulation the reference's tree
topology exists to express (reference: lqr.hpp:5-22 general trees;
benchmarked shapes at lqr_benchmark.cpp:209-271).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..model import ModelSpec, box_bounds
from ..types import Dimensions, Topology


def robust_scenario_tree(t_shared: int = 2, n_branches: int = 4,
                         t_branch: int = 12, dt: float = 0.1,
                         u_limit: float = 2.0, disturbance: float = 0.3):
    """Returns (spec, dims, topology, lower, upper, initial_state).

    Disturbance realizations are evenly spread in
    [-disturbance, +disturbance] across branches and enter the velocity
    dynamics as a constant push.
    """
    S = n_branches
    edge_parents, edge_children = [], []
    # shared prefix: nodes 0..t_shared form a chain
    for i in range(t_shared):
        edge_parents.append(i)
        edge_children.append(i + 1)
    # branches: each a chain of t_branch nodes hanging off node t_shared
    edge_branch = [-1] * t_shared       # -1 = shared edge
    next_node = t_shared + 1
    for s in range(S):
        prev = t_shared
        for _ in range(t_branch):
            edge_parents.append(prev)
            edge_children.append(next_node)
            edge_branch.append(s)
            prev = next_node
            next_node += 1
    E = len(edge_parents)
    N = next_node
    topo = Topology.tree(0, edge_parents, edge_children)

    if S > 1:
        levels = np.linspace(-disturbance, disturbance, S)
    else:
        levels = np.zeros(1)
    # per-edge disturbance (0 on shared edges) and per-edge probability
    edge_drift = jnp.asarray([0.0 if b < 0 else float(levels[b])
                              for b in edge_branch])
    edge_prob = jnp.asarray([1.0 if b < 0 else 1.0 / S
                             for b in edge_branch])
    # per-node probability: a node's weight is its subtree's probability
    node_prob_np = np.ones(N)
    for e in range(E):
        node_prob_np[edge_children[e]] = (1.0 if edge_branch[e] < 0
                                          else 1.0 / S)
    node_prob = jnp.asarray(node_prob_np)

    A = jnp.asarray([[1.0, dt], [0.0, 1.0]])
    B = jnp.asarray([[0.0], [dt]])

    def dynamics(x, u, th, i):
        return A @ x + B @ u[:1] + edge_drift[i] * jnp.asarray([0.0, dt])

    def node_cost(x, th, i):
        return 0.5 * node_prob[i] * jnp.sum(x ** 2)

    def edge_cost(x, u, th, i):
        return 0.5 * 0.05 * edge_prob[i] * jnp.sum(u ** 2)

    spec = ModelSpec(dynamics=dynamics, node_cost=node_cost,
                     edge_cost=edge_cost)
    dims = Dimensions.uniform(num_edges=E, state_dim=2, control_dim=1)
    lower, upper = box_bounds(dims, u_lower=-u_limit, u_upper=u_limit)
    x0 = jnp.asarray([1.5, 0.0])
    return spec, dims, topo, lower, upper, x0
