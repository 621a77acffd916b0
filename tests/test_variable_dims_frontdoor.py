"""Variable stage dimensions through the autodiff front door (BASELINE
config 2; reference capability: tests/variable_dimensions_test.cpp).

Oracle pattern: a variable-dimension problem and a uniform-dimension
problem constructed to be mathematically equivalent (the extra entries are
decoupled, zero-cost, zero-initialized) must produce identical live
trajectories."""

import numpy as np
import jax
import jax.numpy as jnp

from sip_optimal_control_tpu import (Dimensions, ModelSpec, Settings,
                                     SIPStatus, Topology, box_bounds,
                                     build_problem, solve)

_dt = 0.1
_SETTINGS = Settings(max_iterations=60)


def test_growing_state_matches_uniform_equivalent():
    """Nodes 0..2 carry [p, v]; nodes 3..6 add an integral state z with
    z' = z + dt*p.  Uniform oracle: carry z from the start (z0 = 0, no
    dynamics input until stage 3, no cost) — identical live solution."""
    T = 6
    grow_at = 3   # first node with the 3-dim state

    def dyn_var(x, u, th, i):
        p, v = x[0], x[1]
        p2 = p + _dt * v
        v2 = v + _dt * u[0]
        # z row only read for child nodes >= grow_at (masked otherwise);
        # z of the parent is 0-padded for parents < grow_at
        z2 = x[2] + _dt * p
        return jnp.stack([p2, v2, z2])

    def cost_node(x, th, i):
        return 0.5 * (x[0] ** 2 + 0.1 * x[1] ** 2
                      + jnp.where(i >= grow_at, 0.5 * x[2] ** 2, 0.0))

    def cost_edge(x, u, th, i):
        return 0.05 * jnp.sum(u ** 2)

    spec = ModelSpec(dynamics=dyn_var, node_cost=cost_node,
                     edge_cost=cost_edge)

    state_dims = tuple(2 if node < grow_at else 3 for node in range(T + 1))
    dims_var = Dimensions(theta_dim=0, state_dims=state_dims,
                          control_dims=(1,) * T, node_c_dims=(0,) * (T + 1),
                          node_g_dims=(0,) * (T + 1), edge_c_dims=(0,) * T,
                          edge_g_dims=(0,) * T)
    prob_var = build_problem(spec, dims_var, Topology.chain(T),
                             initial_state=jnp.asarray([1.0, 0.0]))
    res_var = jax.jit(lambda: solve(prob_var, _SETTINGS))()
    assert int(res_var.status) == SIPStatus.SOLVED

    # uniform oracle: z exists everywhere; z0 fixed by the root row to 0,
    # z' = z + dt*p from the start, and the cost applies from grow_at only
    # -> at nodes < grow_at, z equals the same partial integral but is
    # free of cost; to be truly equivalent, zero z's dynamics before
    # grow_at so z stays 0 until it starts accumulating.
    def dyn_uni(x, u, th, i):
        p, v, z = x[0], x[1], x[2]
        p2 = p + _dt * v
        v2 = v + _dt * u[0]
        z2 = jnp.where(i + 1 >= 3, z + _dt * p, 0.0)
        return jnp.stack([p2, v2, z2])

    dims_uni = Dimensions.uniform(num_edges=T, state_dim=3, control_dim=1)
    prob_uni = build_problem(
        ModelSpec(dynamics=dyn_uni, node_cost=cost_node,
                  edge_cost=cost_edge),
        dims_uni, Topology.chain(T),
        initial_state=jnp.asarray([1.0, 0.0, 0.0]))
    res_uni = jax.jit(lambda: solve(prob_uni, _SETTINGS))()
    assert int(res_uni.status) == SIPStatus.SOLVED

    np.testing.assert_allclose(np.asarray(res_var.vars.u),
                               np.asarray(res_uni.vars.u), atol=1e-7)
    np.testing.assert_allclose(np.asarray(res_var.vars.x[:, :2]),
                               np.asarray(res_uni.vars.x[:, :2]), atol=1e-7)
    # dead z entries of early nodes are exactly zero
    assert np.all(np.asarray(res_var.vars.x)[:3, 2] == 0.0)


def test_varying_control_dims_match_uniform_equivalent():
    """Even edges have 1 control, odd edges 2 (the second control steers v
    directly).  Uniform oracle: 2 controls everywhere, the second with zero
    effect + small cost on even edges (its optimum is 0, decoupled)."""
    T = 6

    def dyn(x, u, th, i):
        gain2 = jnp.where(i % 2 == 1, 1.0, 0.0)
        p2 = x[0] + _dt * x[1]
        v2 = x[1] + _dt * (u[0] + gain2 * u[1])
        return jnp.stack([p2, v2])

    def cost_node(x, th, i):
        return 0.5 * jnp.sum(x ** 2)

    def cost_edge(x, u, th, i):
        return 0.05 * jnp.sum(u ** 2)

    spec = ModelSpec(dynamics=dyn, node_cost=cost_node, edge_cost=cost_edge)
    control_dims = tuple(2 if e % 2 == 1 else 1 for e in range(T))
    dims_var = Dimensions(theta_dim=0, state_dims=(2,) * (T + 1),
                          control_dims=control_dims,
                          node_c_dims=(0,) * (T + 1),
                          node_g_dims=(0,) * (T + 1),
                          edge_c_dims=(0,) * T, edge_g_dims=(0,) * T)
    prob_var = build_problem(spec, dims_var, Topology.chain(T),
                             initial_state=jnp.asarray([1.0, 0.0]))
    res_var = jax.jit(lambda: solve(prob_var, _SETTINGS))()
    assert int(res_var.status) == SIPStatus.SOLVED

    dims_uni = Dimensions.uniform(num_edges=T, state_dim=2, control_dim=2)
    prob_uni = build_problem(spec, dims_uni, Topology.chain(T),
                             initial_state=jnp.asarray([1.0, 0.0]))
    res_uni = jax.jit(lambda: solve(prob_uni, _SETTINGS))()
    assert int(res_uni.status) == SIPStatus.SOLVED

    np.testing.assert_allclose(np.asarray(res_var.vars.u[:, 0]),
                               np.asarray(res_uni.vars.u[:, 0]), atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(res_var.vars.u[1::2, 1]),
        np.asarray(res_uni.vars.u[1::2, 1]), atol=1e-7)
    # dead second controls on even edges are exactly zero
    assert np.all(np.asarray(res_var.vars.u)[0::2, 1] == 0.0)


def test_stage_varying_constraints_and_bounds():
    """Inequality only at one interior node + a terminal equality, through
    the variable-dims path, with control bounds."""
    T = 5

    def dyn(x, u, th, i):
        return jnp.stack([x[0] + _dt * x[1], x[1] + _dt * u[0]])

    spec = ModelSpec(
        dynamics=dyn,
        node_cost=lambda x, th, i: 0.5 * jnp.sum(x ** 2),
        edge_cost=lambda x, u, th, i: 0.05 * jnp.sum(u ** 2),
        # velocity cap only at node 2; pin the final position at 0.5
        node_ineq=lambda x, th, i: jnp.stack([x[1] - 0.6]),
        node_eq=lambda x, th, i: jnp.stack([x[0] - 0.5]),
    )
    node_g = tuple(1 if node == 2 else 0 for node in range(T + 1))
    node_c = tuple(1 if node == T else 0 for node in range(T + 1))
    dims = Dimensions(theta_dim=0, state_dims=(2,) * (T + 1),
                      control_dims=(1,) * T, node_c_dims=node_c,
                      node_g_dims=node_g, edge_c_dims=(0,) * T,
                      edge_g_dims=(0,) * T)
    lower, upper = box_bounds(dims, u_lower=-20.0, u_upper=20.0)
    prob = build_problem(spec, dims, Topology.chain(T),
                         initial_state=jnp.zeros(2),
                         lower=lower, upper=upper)
    res = jax.jit(lambda: solve(prob, Settings(max_iterations=80)))()
    assert int(res.status) == SIPStatus.SOLVED, int(res.status)
    x = np.asarray(res.vars.x)
    assert x[2, 1] <= 0.6 + 1e-6           # the one active-stage cap
    assert abs(x[T, 0] - 0.5) < 1e-6       # terminal equality
    assert np.all(np.abs(np.asarray(res.vars.u)) <= 20.0 + 1e-7)
    # the cap exists only at node 2: other nodes may exceed it
    assert np.any(x[[1, 3, 4], 1] > 0.6), x[:, 1]
