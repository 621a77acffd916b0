"""End-to-end interior-point solver tests.

Covers the reference's one true end-to-end solve (reference:
tests/variable_dimensions_test.cpp:365-448 — analytic 2-node problem with
known optimum), plus equality-constrained LQR vs a dense QP oracle, box
constraints, and warm starting.
"""

import numpy as np
import jax
import jax.numpy as jnp

from sip_optimal_control_tpu import (Dimensions, ModelSpec, Settings,
                                     SIPStatus, Topology, box_bounds,
                                     build_problem, solve)
from sip_optimal_control_tpu.solver.sip import Primal


def test_analytic_two_node_problem():
    """min 0.5 x0^2 + 0.5 (x1-2)^2 + 0.5 u^2  s.t. x1 = x0 + u, x0 = 1.
    Optimum: x = (1.0, 1.5), u = 0.5
    (reference: variable_dimensions_test.cpp:365-448)."""
    dims = Dimensions.uniform(num_edges=1, state_dim=1, control_dim=1)
    spec = ModelSpec(
        dynamics=lambda x, u, th, i: x + u,
        node_cost=lambda x, th, i: jnp.where(
            i == 0, 0.5 * x[0] ** 2, 0.5 * (x[0] - 2.0) ** 2),
        edge_cost=lambda x, u, th, i: 0.5 * u[0] ** 2,
    )
    problem = build_problem(spec, dims, Topology.chain(1),
                            initial_state=jnp.asarray([1.0]))
    result = jax.jit(lambda: solve(problem, Settings()))()
    assert int(result.status) == SIPStatus.SOLVED, int(result.status)
    np.testing.assert_allclose(float(result.vars.x[0, 0]), 1.0, atol=1e-8)
    np.testing.assert_allclose(float(result.vars.u[0, 0]), 0.5, atol=1e-8)
    np.testing.assert_allclose(float(result.vars.x[1, 0]), 1.5, atol=1e-8)


def _double_integrator_spec(T, dt=0.1, q=1.0, r=0.1, qf=10.0):
    A = jnp.asarray([[1.0, dt], [0.0, 1.0]])
    B = jnp.asarray([[0.5 * dt * dt], [dt]])

    def dynamics(x, u, th, i):
        return A @ x + B @ u

    def node_cost(x, th, i):
        w = jnp.where(i == T, qf, q)
        return 0.5 * w * jnp.sum(x ** 2)

    def edge_cost(x, u, th, i):
        return 0.5 * r * jnp.sum(u ** 2)

    return ModelSpec(dynamics=dynamics, node_cost=node_cost,
                     edge_cost=edge_cost), np.asarray(A), np.asarray(B)


def _dense_lqr_solve(A, B, x0, T, q, r, qf):
    """Dense equality-constrained QP oracle for the double integrator."""
    n, m = A.shape[0], B.shape[1]
    nv = (T + 1) * n + T * m

    def xi(i):
        return slice(i * n, (i + 1) * n)

    def ui(e):
        return slice((T + 1) * n + e * m, (T + 1) * n + (e + 1) * m)

    H = np.zeros((nv, nv))
    for i in range(T + 1):
        H[xi(i), xi(i)] = (qf if i == T else q) * np.eye(n)
    for e in range(T):
        H[ui(e), ui(e)] = r * np.eye(m)
    nc = (T + 1) * n
    C = np.zeros((nc, nv))
    d = np.zeros(nc)
    C[0:n, xi(0)] = -np.eye(n)
    d[0:n] = -x0
    for e in range(T):
        rows = slice((e + 1) * n, (e + 2) * n)
        C[rows, xi(e)] = A
        C[rows, ui(e)] = B
        C[rows, xi(e + 1)] = -np.eye(n)
    KKT = np.block([[H, C.T], [C, np.zeros((nc, nc))]])
    rhs = np.concatenate([np.zeros(nv), d])
    sol = np.linalg.solve(KKT, rhs)
    xs = sol[:(T + 1) * n].reshape(T + 1, n)
    us = sol[(T + 1) * n:nv].reshape(T, m)
    return xs, us


def test_double_integrator_lqr_matches_dense_qp():
    """BASELINE config 1: double-integrator LQR, horizon 20."""
    T, dt, q, r, qf = 20, 0.1, 1.0, 0.1, 10.0
    dims = Dimensions.uniform(num_edges=T, state_dim=2, control_dim=1)
    spec, A, B = _double_integrator_spec(T, dt, q, r, qf)
    x0 = jnp.asarray([1.0, 0.0])
    problem = build_problem(spec, dims, Topology.chain(T), initial_state=x0)
    result = jax.jit(lambda: solve(problem, Settings()))()
    assert int(result.status) == SIPStatus.SOLVED
    xs, us = _dense_lqr_solve(A, B, np.asarray(x0), T, q, r, qf)
    np.testing.assert_allclose(np.asarray(result.vars.x), xs, atol=1e-7)
    np.testing.assert_allclose(np.asarray(result.vars.u), us, atol=1e-7)


def test_control_bounds_active():
    """Box input constraints: clipped controls, KKT-solved."""
    T = 20
    dims = Dimensions.uniform(num_edges=T, state_dim=2, control_dim=1)
    spec, A, B = _double_integrator_spec(T)
    lower, upper = box_bounds(dims, u_lower=-0.5, u_upper=0.5)
    x0 = jnp.asarray([2.0, 0.0])
    problem = build_problem(spec, dims, Topology.chain(T), initial_state=x0,
                            lower=lower, upper=upper)
    result = jax.jit(lambda: solve(problem, Settings()))()
    assert int(result.status) == SIPStatus.SOLVED
    u = np.asarray(result.vars.u)
    assert np.all(u <= 0.5 + 1e-9)
    assert np.all(u >= -0.5 - 1e-9)
    # unconstrained solution clips: at least one active bound expected
    assert np.any(np.abs(np.abs(u) - 0.5) < 1e-6)


def test_inequality_constraints_via_edge_ineq():
    """Same control bound expressed as a general edge inequality g <= 0."""
    T = 10
    dims = Dimensions.uniform(num_edges=T, state_dim=2, control_dim=1,
                              edge_g_dim=2)
    base, A, B = _double_integrator_spec(T)
    spec = ModelSpec(dynamics=base.dynamics, node_cost=base.node_cost,
                     edge_cost=base.edge_cost,
                     edge_ineq=lambda x, u, th, i: jnp.concatenate(
                         [u - 0.5, -u - 0.5]))
    x0 = jnp.asarray([2.0, 0.0])
    problem = build_problem(spec, dims, Topology.chain(T), initial_state=x0)
    result = jax.jit(lambda: solve(problem, Settings()))()
    assert int(result.status) == SIPStatus.SOLVED
    u = np.asarray(result.vars.u)
    assert np.all(np.abs(u) <= 0.5 + 1e-7)

    # cross-check against the box-bound formulation of the same problem
    lower, upper = box_bounds(
        Dimensions.uniform(num_edges=T, state_dim=2, control_dim=1),
        u_lower=-0.5, u_upper=0.5)
    problem_box = build_problem(
        base, Dimensions.uniform(num_edges=T, state_dim=2, control_dim=1),
        Topology.chain(T), initial_state=x0, lower=lower, upper=upper)
    result_box = jax.jit(lambda: solve(problem_box, Settings()))()
    np.testing.assert_allclose(u, np.asarray(result_box.vars.u), atol=1e-6)


def test_warm_start_fewer_iterations():
    T = 10
    dims = Dimensions.uniform(num_edges=T, state_dim=2, control_dim=1)
    spec, _, _ = _double_integrator_spec(T)
    x0 = jnp.asarray([1.0, 0.0])
    problem = build_problem(spec, dims, Topology.chain(T), initial_state=x0)
    cold = jax.jit(lambda: solve(problem, Settings()))()
    assert int(cold.status) == SIPStatus.SOLVED
    warm = jax.jit(lambda v, y: solve(problem, Settings(), init_vars=v,
                                      init_y=y))(cold.vars, cold.y)
    assert int(warm.status) == SIPStatus.SOLVED
    assert int(warm.iterations) <= int(cold.iterations)


def test_full_workspace_warm_start():
    """Warm-starting ALL carried variables (x, y, z, zl, zu) — the
    reference persists the whole sip_workspace.vars the same way
    (reference: tests/variable_dimensions_test.cpp:437-446).  Must solve in
    no more iterations than the (x, y)-only warm start, with the carried
    bound duals projected into the kappa_sigma corridor."""
    T = 10
    dims = Dimensions.uniform(num_edges=T, state_dim=2, control_dim=1)
    spec, _, _ = _double_integrator_spec(T)
    lower, upper = box_bounds(dims, u_lower=-0.5, u_upper=0.5)
    x0 = jnp.asarray([1.0, 0.0])
    problem = build_problem(spec, dims, Topology.chain(T),
                            initial_state=x0, lower=lower, upper=upper)
    cold = jax.jit(lambda: solve(problem, Settings()))()
    assert int(cold.status) == SIPStatus.SOLVED
    xy = jax.jit(lambda r: solve(problem, Settings(), init_vars=r.vars,
                                 init_y=r.y))(cold)
    full = jax.jit(lambda r: solve(problem, Settings(), init_vars=r.vars,
                                   init_y=r.y, init_z=r.z, init_zl=r.zl,
                                   init_zu=r.zu))(cold)
    assert int(full.status) == SIPStatus.SOLVED
    assert int(full.iterations) <= int(xy.iterations)
    np.testing.assert_allclose(np.asarray(full.vars.u),
                               np.asarray(cold.vars.u), atol=1e-5)


def test_batched_solve_vmap():
    """Scenario batching: vmap over initial states."""
    T = 10
    dims = Dimensions.uniform(num_edges=T, state_dim=2, control_dim=1)
    spec, A, B = _double_integrator_spec(T)

    def solve_one(x0):
        problem = build_problem(spec, dims, Topology.chain(T),
                                initial_state=x0)
        return solve(problem, Settings())

    x0s = jnp.asarray([[1.0, 0.0], [0.5, -0.2], [-1.0, 0.3], [2.0, 1.0]])
    results = jax.jit(jax.vmap(solve_one))(x0s)
    assert np.all(np.asarray(results.status) == SIPStatus.SOLVED)
    # each batch member matches its standalone solve
    single = jax.jit(solve_one)(x0s[2])
    np.testing.assert_allclose(np.asarray(results.vars.u)[2],
                               np.asarray(single.vars.u), atol=1e-9)


def test_converged_warm_start_exits_without_stepping():
    """A warm start that already satisfies the tolerance exits with zero
    iterations (the loop classifies the initial iterate; no wasted
    factor/solve trip)."""
    T = 10
    dims = Dimensions.uniform(num_edges=T, state_dim=2, control_dim=1)
    spec, _, _ = _double_integrator_spec(T)
    x0 = jnp.asarray([1.0, 0.0])
    problem = build_problem(spec, dims, Topology.chain(T), initial_state=x0)
    tight = Settings(tol=1e-10)
    cold = jax.jit(lambda: solve(problem, tight))()
    assert int(cold.status) == SIPStatus.SOLVED

    loose = Settings(tol=1e-6)
    warm = jax.jit(lambda v, y: solve(problem, loose, init_vars=v,
                                      init_y=y))(cold.vars, cold.y)
    assert int(warm.status) == SIPStatus.SOLVED
    assert int(warm.iterations) == 0
    np.testing.assert_allclose(np.asarray(warm.vars.u),
                               np.asarray(cold.vars.u), atol=1e-12)


def test_per_element_residual_scaling():
    """Per-element residual-scaling vectors (reference: ResidualScaling
    double arrays, types.hpp:144-148, wired with real per-element data at
    variable_dimensions_test.cpp:421-427).

    (a) Non-uniform positive vectors: the solve converges to the same
    optimum (scaling only reweights the convergence test).
    (b) The vectors demonstrably enter the test: zeroing the dual +
    equality + bound scalings makes a bound-constrained problem (whose
    unscaled rows are nonzero at the init) classify SOLVED immediately.
    """
    import dataclasses
    from sip_optimal_control_tpu.solver.sip import YVec

    dims = Dimensions.uniform(num_edges=1, state_dim=1, control_dim=1)
    spec = ModelSpec(
        dynamics=lambda x, u, th, i: x + u,
        node_cost=lambda x, th, i: jnp.where(
            i == 0, 0.5 * x[0] ** 2, 0.5 * (x[0] - 2.0) ** 2),
        edge_cost=lambda x, u, th, i: 0.5 * u[0] ** 2,
    )
    sd = Primal(x=jnp.asarray([[0.5], [2.0]]), u=jnp.asarray([[3.0]]),
                theta=jnp.ones((0,)))
    se = YVec(dyn=jnp.asarray([[4.0], [0.25]]), nc=jnp.zeros((2, 1)),
              ec=jnp.zeros((1, 1)))
    problem = build_problem(spec, dims, Topology.chain(1),
                            initial_state=jnp.asarray([1.0]),
                            scale_dual=sd, scale_equality=se,
                            scale_bound=sd)
    result = jax.jit(lambda: solve(problem, Settings()))()
    assert int(result.status) == SIPStatus.SOLVED, int(result.status)
    np.testing.assert_allclose(float(result.vars.x[0, 0]), 1.0, atol=1e-7)
    np.testing.assert_allclose(float(result.vars.u[0, 0]), 0.5, atol=1e-7)
    np.testing.assert_allclose(float(result.vars.x[1, 0]), 1.5, atol=1e-7)

    # numpy / 0-d jnp scalars must keep working as scalar scalings
    pnp = build_problem(spec, dims, Topology.chain(1),
                        initial_state=jnp.asarray([1.0]),
                        scale_dual=np.float32(2.0),
                        scale_equality=jnp.asarray(0.5),
                        scale_bound=np.float64(1.0))
    rnp = jax.jit(lambda: solve(pnp, Settings()))()
    assert int(rnp.status) == SIPStatus.SOLVED

    # (b) zero vectors silence the scaled residual rows; only the (unscaled)
    # g+s row remains, which a bounds-only problem satisfies by slack init
    lower, upper = box_bounds(dims, u_lower=-0.1, u_upper=0.1)
    zero_sd = jax.tree.map(jnp.zeros_like, sd)
    zero_se = jax.tree.map(jnp.zeros_like, se)
    silenced = build_problem(spec, dims, Topology.chain(1),
                             initial_state=jnp.asarray([1.0]),
                             lower=lower, upper=upper,
                             scale_dual=zero_sd, scale_equality=zero_se,
                             scale_bound=zero_sd)
    res0 = jax.jit(lambda: solve(silenced, Settings()))()
    assert int(res0.status) == SIPStatus.SOLVED
    assert int(res0.iterations) == 0
    # the unscaled problem does NOT classify the same init as solved
    unscaled = build_problem(spec, dims, Topology.chain(1),
                             initial_state=jnp.asarray([1.0]),
                             lower=lower, upper=upper)
    res1 = jax.jit(lambda: solve(unscaled, Settings()))()
    assert int(res1.iterations) > 0


def test_fixed_iterations_requires_positive_budget():
    """fixed_iterations with max_iterations=0 is rejected at trace time
    (a 0-length scan would skip the body the while_loop always runs)."""
    import pytest
    dims = Dimensions.uniform(num_edges=1, state_dim=1, control_dim=1)
    spec = ModelSpec(dynamics=lambda x, u, th, i: x + u)
    problem = build_problem(spec, dims, Topology.chain(1),
                            initial_state=jnp.asarray([1.0]))
    with pytest.raises(ValueError, match="max_iterations"):
        solve(problem, Settings(fixed_iterations=True, max_iterations=0))
