"""Derivative checker, filter line search, and iterative refinement tests."""

import numpy as np
import jax
import jax.numpy as jnp

from sip_optimal_control_tpu import (Dimensions, ModelSpec, Settings,
                                     SIPStatus, Topology, build_problem,
                                     solve)
from sip_optimal_control_tpu.solver.settings import LineSearchSettings
from sip_optimal_control_tpu.solver.sip import Primal, YVec, ZVec
from sip_optimal_control_tpu.utils import check_derivatives


def _nonlinear_problem(T=6):
    dims = Dimensions.uniform(num_edges=T, state_dim=2, control_dim=1,
                              node_g_dim=1, edge_c_dim=1)
    spec = ModelSpec(
        dynamics=lambda x, u, th, i: jnp.stack(
            [x[0] + 0.1 * x[1], x[1] + 0.1 * jnp.sin(x[0]) + 0.1 * u[0]]),
        node_cost=lambda x, th, i: 0.5 * jnp.sum(x ** 2)
        + 0.1 * jnp.cos(x[0]),
        edge_cost=lambda x, u, th, i: 0.5 * jnp.sum(u ** 2),
        node_ineq=lambda x, th, i: jnp.asarray([x[0] ** 2 - 4.0]),
        edge_eq=lambda x, u, th, i: jnp.asarray([0.05 * x[0] * u[0]]),
    )
    return spec, dims, Topology.chain(T)


def test_derivative_checker_autodiff_consistent():
    spec, dims, topo = _nonlinear_problem()
    problem = build_problem(spec, dims, topo, initial_state=jnp.zeros(2))
    rng = np.random.default_rng(0)
    N, E = dims.num_nodes, dims.num_edges
    vars = Primal(x=jnp.asarray(0.3 * rng.standard_normal((N, 2))),
                  u=jnp.asarray(0.3 * rng.standard_normal((E, 1))),
                  theta=jnp.zeros(0))
    y = YVec(dyn=jnp.asarray(0.1 * rng.standard_normal((N, 2))),
             nc=jnp.zeros((N, 0)),
             ec=jnp.asarray(0.1 * rng.standard_normal((E, 1))))
    z = ZVec(n=jnp.asarray(0.1 * rng.random((N, 1))), e=jnp.zeros((E, 0)))
    errs = check_derivatives(problem, vars, y, z, eps=1e-6)
    for name, err in errs.items():
        assert err < 1e-7, (name, err)


def test_filter_line_search_solves():
    spec, dims, topo = _nonlinear_problem()
    problem = build_problem(spec, dims, topo,
                            initial_state=jnp.asarray([1.0, 0.0]))
    st = Settings(max_iterations=80,
                  line_search=LineSearchSettings(
                      use_filter_line_search=True))
    res = jax.jit(lambda: solve(problem, st))()
    assert int(res.status) == SIPStatus.SOLVED
    assert float(res.kkt_error) < 1e-8
    # and the merit version agrees on the solution
    res_m = jax.jit(lambda: solve(problem, Settings(max_iterations=80)))()
    np.testing.assert_allclose(np.asarray(res.vars.u),
                               np.asarray(res_m.vars.u), atol=1e-6)


def test_iterative_refinement():
    spec, dims, topo = _nonlinear_problem()
    problem = build_problem(spec, dims, topo,
                            initial_state=jnp.asarray([1.0, 0.0]))
    st = Settings(max_iterations=80, iterative_refinement_steps=1)
    res = jax.jit(lambda: solve(problem, st))()
    assert int(res.status) == SIPStatus.SOLVED
    assert float(res.kkt_error) < 1e-8


def test_warm_start_checkpoint_round_trip(tmp_path):
    """save_warm_start/load_warm_start resumes a solve across processes:
    the resumed solve is bit-identical to the in-memory warm start."""
    from sip_optimal_control_tpu.utils import (load_warm_start,
                                               save_warm_start)

    spec, dims, topo = _nonlinear_problem()
    problem = build_problem(spec, dims, topo, initial_state=jnp.asarray(
        [0.4, -0.2]))
    st = Settings(max_iterations=40)
    res = jax.jit(lambda: solve(problem, st))()
    assert int(res.status) == SIPStatus.SOLVED

    path = str(tmp_path / "warm.npz")
    save_warm_start(path, res.vars, res.y)
    loaded_vars, loaded_y = load_warm_start(path)
    np.testing.assert_array_equal(np.asarray(res.vars.x), loaded_vars.x)
    np.testing.assert_array_equal(np.asarray(res.y.ec), loaded_y.ec)

    st2 = Settings(max_iterations=10, mu_init=1e-4)
    resume_fn = jax.jit(
        lambda v, y: solve(problem, st2, init_vars=v, init_y=y))
    resume = resume_fn(jax.tree.map(jnp.asarray, loaded_vars),
                       jax.tree.map(jnp.asarray, loaded_y))
    mem = resume_fn(res.vars, res.y)
    assert int(resume.status) == SIPStatus.SOLVED
    np.testing.assert_allclose(np.asarray(resume.vars.u),
                               np.asarray(mem.vars.u), rtol=0, atol=0)


def test_warm_start_checkpoint_batched_and_invalid(tmp_path):
    from sip_optimal_control_tpu.utils import (load_warm_start,
                                               save_warm_start)

    B, N, E = 3, 5, 4
    vars = Primal(x=jnp.ones((B, N, 2)), u=jnp.zeros((B, E, 1)),
                  theta=jnp.zeros((B, 0)))
    y = YVec(dyn=jnp.ones((B, N, 2)), nc=jnp.zeros((B, N, 0)),
             ec=jnp.zeros((B, E, 1)))
    path = str(tmp_path / "batched.npz")
    save_warm_start(path, vars, y)
    lv, ly = load_warm_start(path)
    assert lv.x.shape == (B, N, 2) and ly.dyn.shape == (B, N, 2)

    bad = str(tmp_path / "bad.npz")
    np.savez(bad, x=np.zeros(3))
    try:
        load_warm_start(bad)
        raised = False
    except ValueError:
        raised = True
    assert raised
