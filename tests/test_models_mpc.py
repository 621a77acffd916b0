"""Model-library and MPC-loop tests (BASELINE configs 3 and 4)."""

import numpy as np
import jax
import jax.numpy as jnp

from sip_optimal_control_tpu import (Settings, SIPStatus, build_problem,
                                     solve)
from sip_optimal_control_tpu.models import (cartpole_swingup,
                                            double_integrator,
                                            planar_quadrotor)
from sip_optimal_control_tpu.mpc import run_mpc, run_mpc_timed


def test_cartpole_swingup_solves():
    """BASELINE config 3: cartpole swing-up, horizon 50, box inputs."""
    spec, dims, topo, lower, upper, x0 = cartpole_swingup()
    problem = build_problem(spec, dims, topo, initial_state=x0,
                            lower=lower, upper=upper)
    res = jax.jit(lambda: solve(problem, Settings(max_iterations=200)))()
    assert int(res.status) == SIPStatus.SOLVED
    xf = np.asarray(res.vars.x[-1])
    assert abs(xf[2]) < 0.05          # pole upright
    u = np.asarray(res.vars.u)
    assert np.all(np.abs(u) <= 10.0 + 1e-7)
    assert np.any(np.abs(u) > 9.0)    # saturates during the swing


def test_quadrotor_mpc_tracks_target():
    """BASELINE config 4 (reduced steps for CI): receding-horizon quadrotor
    MPC with warm starting."""
    spec, dims, topo, lower, upper, hover = planar_quadrotor(
        horizon=15, target=jnp.asarray([1.0, 1.0]))
    x0 = jnp.zeros(6)
    trace = jax.jit(lambda: run_mpc(
        spec, dims, topo, x0, n_steps=40,
        settings=Settings(max_iterations=30, tol=1e-6),
        lower=lower, upper=upper))()
    assert np.all(np.asarray(trace.statuses) == SIPStatus.SOLVED)
    final = np.asarray(trace.states[-1])
    assert abs(final[0] - 1.0) < 0.05 and abs(final[1] - 1.0) < 0.05
    # warm starting keeps late-loop iteration counts low
    iters = np.asarray(trace.iterations)
    assert iters[-10:].mean() <= iters[0]


def test_mpc_timed_wall_clock_budget():
    """run_mpc_timed: the dispatch-level `timeout_callback` equivalent
    (reference: sip_optimal_control/types.hpp:139-140).  A zero budget
    issues no steps beyond the first deadline check; a generous budget
    completes all steps and matches run_mpc's closed loop."""
    spec, dims, topo, lower, upper, _ = planar_quadrotor(horizon=10)
    x0 = jnp.asarray([0.5, 0.0, 0.0, 0.0, 0.0, 0.0])
    settings = Settings(max_iterations=25, tol=1e-6)

    full = run_mpc_timed(spec, dims, topo, x0, max_steps=6,
                         time_budget_s=600.0, settings=settings,
                         lower=lower, upper=upper)
    assert full.controls.shape[0] == 6
    assert np.all(np.asarray(full.statuses) == SIPStatus.SOLVED)
    ref = run_mpc(spec, dims, topo, x0, n_steps=6, settings=settings,
                  lower=lower, upper=upper)
    np.testing.assert_allclose(np.asarray(full.states),
                               np.asarray(ref.states), atol=1e-8)

    cut = run_mpc_timed(spec, dims, topo, x0, max_steps=6,
                        time_budget_s=0.0, settings=settings,
                        lower=lower, upper=upper)
    assert cut.controls.shape[0] == 0


def test_mpc_batched_scenarios():
    spec, dims, topo, lower, upper, _ = planar_quadrotor(horizon=10)
    x0s = jnp.asarray([
        [0.5, 0.0, 0.0, 0.0, 0.0, 0.0],
        [-0.5, 0.3, 0.1, 0.0, 0.0, 0.0],
    ])
    trace = jax.jit(jax.vmap(lambda x0: run_mpc(
        spec, dims, topo, x0, n_steps=10,
        settings=Settings(max_iterations=25, tol=1e-6),
        lower=lower, upper=upper)))(x0s)
    assert np.all(np.asarray(trace.statuses) == SIPStatus.SOLVED)
    # both scenarios move toward the origin
    finals = np.asarray(trace.states[:, -1])
    starts = np.asarray(x0s)
    assert np.all(np.linalg.norm(finals[:, :2], axis=1)
                  < np.linalg.norm(starts[:, :2], axis=1))


def test_robust_scenario_tree_model():
    """BASELINE config 5's problem class as a library model: shared stages
    + per-branch disturbance realizations, expected cost.

    Oracle: with t_shared=0 the branches are fully independent, so each
    branch's controls must equal the standalone chain solve of that
    scenario (probability weights scale the objective uniformly per branch
    and do not move its argmin)."""
    from sip_optimal_control_tpu.models import robust_scenario_tree
    from sip_optimal_control_tpu import ModelSpec, Topology, Dimensions

    S, TB = 3, 5
    spec, dims, topo, lower, upper, x0 = robust_scenario_tree(
        t_shared=0, n_branches=S, t_branch=TB, disturbance=0.4,
        u_limit=10.0)
    problem = build_problem(spec, dims, topo, initial_state=x0,
                            lower=lower, upper=upper)
    res = jax.jit(lambda: solve(problem, Settings(max_iterations=60)))()
    assert int(res.status) == SIPStatus.SOLVED

    levels = np.linspace(-0.4, 0.4, S)
    dt = 0.1
    A = jnp.asarray([[1.0, dt], [0.0, 1.0]])
    B = jnp.asarray([[0.0], [dt]])
    for s in range(S):
        d = float(levels[s])

        cspec = ModelSpec(
            dynamics=lambda x, u, th, i, d=d: (
                A @ x + B @ u[:1] + d * jnp.asarray([0.0, dt])),
            node_cost=lambda x, th, i: 0.5 * jnp.sum(x ** 2),
            edge_cost=lambda x, u, th, i: 0.5 * 0.05 * jnp.sum(u ** 2))
        cdims = Dimensions.uniform(num_edges=TB, state_dim=2, control_dim=1)
        cres = jax.jit(lambda: solve(
            build_problem(cspec, cdims, Topology.chain(TB),
                          initial_state=x0),
            Settings(max_iterations=60)))()
        assert int(cres.status) == SIPStatus.SOLVED
        u_branch = np.asarray(res.vars.u)[s * TB:(s + 1) * TB]
        np.testing.assert_allclose(u_branch, np.asarray(cres.vars.u),
                                   atol=1e-6)

    # shared-prefix variant: solves, respects bounds, and the shared stages
    # are structurally non-anticipative (single control per shared edge)
    spec2, dims2, topo2, lo2, hi2, x02 = robust_scenario_tree(
        t_shared=2, n_branches=4, t_branch=6, u_limit=1.0)
    p2 = build_problem(spec2, dims2, topo2, initial_state=x02,
                       lower=lo2, upper=hi2)
    r2 = jax.jit(lambda: solve(p2, Settings(max_iterations=80)))()
    assert int(r2.status) == SIPStatus.SOLVED
    assert np.all(np.abs(np.asarray(r2.vars.u)) <= 1.0 + 1e-8)


def test_tree_successor_maps_chain_reduction():
    """On a chain the first-child successor shift reduces exactly to the
    classic one-stage shift (concat semantics)."""
    from sip_optimal_control_tpu import Topology
    from sip_optimal_control_tpu.mpc import (_shift_warm_start,
                                             _shift_warm_start_tree,
                                             _tree_successor_maps)
    from sip_optimal_control_tpu.solver.sip import Primal, YVec
    T = 6
    chain = Topology.chain(T)
    node_succ, edge_succ = _tree_successor_maps(chain)
    np.testing.assert_array_equal(node_succ,
                                  list(range(1, T + 1)) + [T])
    np.testing.assert_array_equal(edge_succ, list(range(1, T)) + [T - 1])
    rng = np.random.default_rng(0)
    vars = Primal(x=jnp.asarray(rng.standard_normal((T + 1, 3))),
                  u=jnp.asarray(rng.standard_normal((T, 2))),
                  theta=jnp.zeros((0,)))
    y = YVec(dyn=jnp.asarray(rng.standard_normal((T + 1, 3))),
             nc=jnp.zeros((T + 1, 1)), ec=jnp.zeros((T, 1)))
    a = _shift_warm_start(vars, y)
    b = _shift_warm_start_tree(vars, y, chain)
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_tree_shift_warm_start_robust_mpc():
    """Receding-horizon robust MPC over a scenario tree with the tree
    shift warm start (VERDICT r3 item 4): the warm-started loop regulates
    and takes fewer iterations per re-solve than cold re-solves."""
    from sip_optimal_control_tpu.models import robust_scenario_tree
    from sip_optimal_control_tpu.mpc import (_shift_warm_start_tree,
                                             _tree_successor_maps)
    # tight input bounds + a large initial state: the active set is
    # nontrivial, so re-discovering it cold at a small mu_init is what the
    # warm start saves (measured: mean iters ~8.4 warm vs ~14.2 cold)
    spec, dims, topo, lower, upper, _ = robust_scenario_tree(
        t_shared=2, n_branches=4, t_branch=8, disturbance=0.5, u_limit=0.8)
    x0 = jnp.asarray([2.5, 0.8])

    # successor-map shape checks on the real scenario tree: the branch
    # point shifts into branch 0, branches shift along themselves
    node_succ, edge_succ = _tree_successor_maps(topo)
    assert node_succ[0] == 1 and node_succ[1] == 2
    assert node_succ[2] == 3          # branch point -> branch 0's first node
    parents = np.asarray(topo.edge_parents)
    children = np.asarray(topo.edge_children)
    for e in range(topo.num_edges):
        c = children[e]
        out_edges = np.nonzero(parents == c)[0]
        if out_edges.size:
            assert edge_succ[e] == out_edges[0]
        else:
            assert edge_succ[e] == e

    settings = Settings(max_iterations=40, tol=1e-6, mu_min=1e-9,
                        mu_init=1e-3)
    trace_w = jax.jit(lambda x: run_mpc(spec, dims, topo, x, n_steps=10,
                                        settings=settings, lower=lower,
                                        upper=upper, warm_start=True))(x0)
    trace_c = jax.jit(lambda x: run_mpc(spec, dims, topo, x, n_steps=10,
                                        settings=settings, lower=lower,
                                        upper=upper, warm_start=False))(x0)
    assert np.all(np.asarray(trace_w.statuses) == SIPStatus.SOLVED)
    # regulation: the (input-saturated) double integrator is braking —
    # velocity heads negative toward the turn-around
    assert float(np.asarray(trace_w.states)[-1, 1]) < \
        float(np.asarray(trace_w.states)[0, 1])
    # the tree warm start saves iterations vs cold re-solves
    assert float(np.mean(np.asarray(trace_w.iterations)[1:])) < \
        float(np.mean(np.asarray(trace_c.iterations)[1:]))
