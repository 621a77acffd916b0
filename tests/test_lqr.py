"""Tree-LQR solver tests.

Mirrors the reference's test strategy (reference: tests/lqr_test.cpp):
residual oracles (not golden values), a dense-KKT cross-check, failure-path
statuses, tree/variable-dimension variants, and vmap batching equivalence.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sip_optimal_control_tpu import (Dimensions, FactorStatus, LQRData,
                                     Topology, compile_topology, lqr_factor,
                                     lqr_factor_solve, lqr_residual_norm,
                                     lqr_solve, pad_lqr_data)


def random_spd(rng, n, diag=2.0):
    s = rng.standard_normal((n, n))
    return s @ s.T / n + diag * np.eye(n)


def make_chain_problem(rng, n, m, T, delta_scale=0.1):
    """Random well-posed chain problem (cf. LQRProblem,
    reference: benchmarks/lqr_benchmark.cpp:47-99)."""
    N = T + 1
    Q = np.stack([random_spd(rng, n) for _ in range(N)])
    R = np.stack([random_spd(rng, m, diag=3.0) for _ in range(T)])
    M = 0.1 * rng.standard_normal((T, n, m))
    A = np.stack([np.eye(n) + 0.1 * rng.standard_normal((n, n))
                  for _ in range(T)])
    B = rng.standard_normal((T, n, m))
    q = rng.standard_normal((N, n))
    r = rng.standard_normal((T, m))
    c = rng.standard_normal((N, n))
    delta = delta_scale * (0.5 + rng.random((N, n)))
    return LQRData(Q=jnp.asarray(Q), q=jnp.asarray(q), c=jnp.asarray(c),
                   delta=jnp.asarray(delta), A=jnp.asarray(A),
                   B=jnp.asarray(B), M=jnp.asarray(M), R=jnp.asarray(R),
                   r=jnp.asarray(r))


def make_tree_problem(rng, topology, n, m, delta_scale=0.1):
    N, E = topology.num_nodes, topology.num_edges
    return LQRData(
        Q=jnp.asarray(np.stack([random_spd(rng, n) for _ in range(N)])),
        q=jnp.asarray(rng.standard_normal((N, n))),
        c=jnp.asarray(rng.standard_normal((N, n))),
        delta=jnp.asarray(delta_scale * (0.5 + rng.random((N, n)))),
        A=jnp.asarray(np.stack([np.eye(n) + 0.1 * rng.standard_normal((n, n))
                                for _ in range(E)])),
        B=jnp.asarray(rng.standard_normal((E, n, m))),
        M=jnp.asarray(0.1 * rng.standard_normal((E, n, m))),
        R=jnp.asarray(np.stack([random_spd(rng, m, diag=3.0)
                                for _ in range(E)])),
        r=jnp.asarray(rng.standard_normal((E, m))),
    )


def dense_kkt_solve(data, topology):
    """Direct dense solve of the regularized KKT system, the parity oracle
    (reference: tests/lqr_test.cpp:859-929).  Unknown ordering:
    [x_0..x_N-1, u_0..u_E-1, y_0..y_N-1]."""
    N, E = topology.num_nodes, topology.num_edges
    n = data.Q.shape[-1]
    m = data.R.shape[-1]
    dim = N * n + E * m + N * n
    Kmat = np.zeros((dim, dim))
    rhs = np.zeros(dim)

    def xi(i):
        return slice(i * n, (i + 1) * n)

    def ui(e):
        return slice(N * n + e * m, N * n + (e + 1) * m)

    def yi(i):
        return slice(N * n + E * m + i * n, N * n + E * m + (i + 1) * n)

    Q = np.asarray(data.Q)
    Rm = np.asarray(data.R)
    Mm = np.asarray(data.M)
    A = np.asarray(data.A)
    B = np.asarray(data.B)
    q = np.asarray(data.q)
    r = np.asarray(data.r)
    c = np.asarray(data.c)
    delta = np.asarray(data.delta)

    for i in range(N):
        Kmat[xi(i), xi(i)] += Q[i]
        Kmat[xi(i), yi(i)] -= np.eye(n)
        rhs[xi(i)] = -q[i]
        Kmat[yi(i), yi(i)] -= np.diag(delta[i])
        rhs[yi(i)] = -c[i]
    root = topology.root
    Kmat[yi(root), xi(root)] -= np.eye(n)
    for e in range(E):
        p = topology.edge_parents[e]
        ch = topology.edge_children[e]
        Kmat[xi(p), ui(e)] += Mm[e]
        Kmat[xi(p), yi(ch)] += A[e].T
        Kmat[ui(e), xi(p)] += Mm[e].T
        Kmat[ui(e), ui(e)] += Rm[e]
        Kmat[ui(e), yi(ch)] += B[e].T
        rhs[ui(e)] = -r[e]
        Kmat[yi(ch), xi(p)] += A[e]
        Kmat[yi(ch), ui(e)] += B[e]
        Kmat[yi(ch), xi(ch)] -= np.eye(n)
    sol = np.linalg.solve(Kmat, rhs)
    x = sol[:N * n].reshape(N, n)
    u = sol[N * n:N * n + E * m].reshape(E, m)
    y = sol[N * n + E * m:].reshape(N, n)
    return x, u, y



def run_solve(data, sched):
    """One jitted factor+solve+residual round trip."""
    @jax.jit
    def go(d):
        sol, status = lqr_factor_solve(d, sched)
        return sol, status, lqr_residual_norm(d, sol, sched)
    return go(data)

def test_chain_residual():
    rng = np.random.default_rng(0)
    data = make_chain_problem(rng, n=3, m=2, T=8)
    topo = Topology.chain(8)
    sched = compile_topology(topo)
    sol, status, res = run_solve(data, sched)
    assert int(status) == FactorStatus.SUCCESS
    assert float(res) < 1e-12


def test_chain_matches_dense_kkt():
    rng = np.random.default_rng(1)
    T = 6
    data = make_chain_problem(rng, n=4, m=2, T=T)
    topo = Topology.chain(T)
    sched = compile_topology(topo)
    sol, status, _ = run_solve(data, sched)
    assert int(status) == FactorStatus.SUCCESS
    x, u, y = dense_kkt_solve(data, topo)
    np.testing.assert_allclose(np.asarray(sol.x), x, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sol.u), u, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sol.y), y, atol=1e-10)


def test_branching_tree_residual_and_dense():
    rng = np.random.default_rng(2)
    # 5-node tree: root 0 -> {1, 2}, 1 -> {3, 4}
    topo = Topology.tree(0, [0, 0, 1, 1], [1, 2, 3, 4])
    sched = compile_topology(topo)
    data = make_tree_problem(rng, topo, n=3, m=2)
    sol, status, res = run_solve(data, sched)
    assert int(status) == FactorStatus.SUCCESS
    assert float(res) < 1e-12
    x, u, y = dense_kkt_solve(data, topo)
    np.testing.assert_allclose(np.asarray(sol.x), x, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sol.u), u, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sol.y), y, atol=1e-10)


def test_shallow_wide_tree():
    rng = np.random.default_rng(3)
    E = 7
    topo = Topology.tree(0, [0] * E, list(range(1, E + 1)))
    sched = compile_topology(topo)
    data = make_tree_problem(rng, topo, n=3, m=1)
    sol, status, res = run_solve(data, sched)
    assert int(status) == FactorStatus.SUCCESS
    assert float(res) < 1e-12


def test_binary_tree():
    rng = np.random.default_rng(4)
    E = 6
    parents = [(ch - 1) // 2 for ch in range(1, E + 1)]
    topo = Topology.tree(0, parents, list(range(1, E + 1)))
    sched = compile_topology(topo)
    data = make_tree_problem(rng, topo, n=2, m=2)
    sol, status, res = run_solve(data, sched)
    assert int(status) == FactorStatus.SUCCESS
    assert float(res) < 1e-12
    x, u, y = dense_kkt_solve(data, topo)
    np.testing.assert_allclose(np.asarray(sol.x), x, atol=1e-10)


def test_invalid_delta_status():
    rng = np.random.default_rng(5)
    T = 2
    data = make_chain_problem(rng, n=2, m=1, T=T)
    data = LQRData(**{**{f.name: getattr(data, f.name)
                         for f in data.__dataclass_fields__.values()},
                      "delta": data.delta.at[T, 0].set(0.0)})
    sched = compile_topology(Topology.chain(T))
    status = jax.jit(lambda d: lqr_factor(d, sched).status)(data)
    assert int(status) == FactorStatus.INVALID_DELTA


def test_f_factorization_failure_status():
    # Q_T = -2 with delta = 1 makes F = I + V indefinite
    # (reference: lqr_test.cpp:213-219).
    data = LQRData(
        Q=jnp.asarray([[[1.0]], [[-2.0]]]),
        q=jnp.zeros((2, 1)), c=jnp.zeros((2, 1)),
        delta=jnp.ones((2, 1)),
        A=jnp.ones((1, 1, 1)), B=jnp.ones((1, 1, 1)),
        M=jnp.zeros((1, 1, 1)), R=jnp.asarray([[[1.0]]]),
        r=jnp.zeros((1, 1)))
    sched = compile_topology(Topology.chain(1))
    status = jax.jit(lambda d: lqr_factor(d, sched).status)(data)
    assert int(status) == FactorStatus.F_FACTORIZATION_FAILURE


def test_g_factorization_failure_status():
    # R = -1 makes G = R + B^T W B indefinite
    # (reference: lqr_test.cpp:221-227).
    data = LQRData(
        Q=jnp.asarray([[[1.0]], [[0.0]]]),
        q=jnp.zeros((2, 1)), c=jnp.zeros((2, 1)),
        delta=0.1 * jnp.ones((2, 1)),
        A=jnp.ones((1, 1, 1)), B=jnp.ones((1, 1, 1)),
        M=jnp.zeros((1, 1, 1)), R=jnp.asarray([[[-1.0]]]),
        r=jnp.zeros((1, 1)))
    sched = compile_topology(Topology.chain(1))
    status = jax.jit(lambda d: lqr_factor(d, sched).status)(data)
    assert int(status) == FactorStatus.G_FACTORIZATION_FAILURE


def test_variable_dimensions_padded():
    """Padded/masked variable-dim problem vs per-block dense solve
    (cf. reference: lqr_test.cpp:466-666)."""
    rng = np.random.default_rng(6)
    topo = Topology.tree(0, [0, 0, 1, 1], [1, 2, 3, 4])
    sched = compile_topology(topo)
    state_dims = (2, 1, 3, 2, 1)
    control_dims = (1, 2, 1, 1)
    dims = Dimensions(theta_dim=0, state_dims=state_dims,
                      control_dims=control_dims,
                      node_c_dims=(0,) * 5, node_g_dims=(0,) * 5,
                      edge_c_dims=(0,) * 4, edge_g_dims=(0,) * 4)
    data = make_tree_problem(rng, topo, n=3, m=2)
    padded = jax.jit(lambda d: pad_lqr_data(d, dims, sched))(data)
    sol, status, res = run_solve(padded, sched)
    assert int(status) == FactorStatus.SUCCESS
    assert float(res) < 1e-12
    # dead entries must be exactly zero
    for i, d in enumerate(state_dims):
        assert np.all(np.asarray(sol.x)[i, d:] == 0.0)
        assert np.all(np.asarray(sol.y)[i, d:] == 0.0)
    for e, d in enumerate(control_dims):
        assert np.all(np.asarray(sol.u)[e, d:] == 0.0)
    # and the padded solve equals the dense solve of the padded system
    x, u, y = dense_kkt_solve(padded, topo)
    np.testing.assert_allclose(np.asarray(sol.x), x, atol=1e-10)


def test_vmap_batching_matches_loop():
    rng = np.random.default_rng(7)
    T = 5
    topo = Topology.chain(T)
    sched = compile_topology(topo)
    batch = [make_chain_problem(rng, 3, 2, T) for _ in range(4)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batch)
    vsol, vstatus = jax.jit(
        jax.vmap(lambda d: lqr_factor_solve(d, sched)))(stacked)
    for b, data in enumerate(batch):
        sol, _, _ = run_solve(data, sched)
        np.testing.assert_allclose(np.asarray(vsol.x)[b], np.asarray(sol.x),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(vsol.u)[b], np.asarray(sol.u),
                                   atol=1e-12)
    assert np.all(np.asarray(vstatus) == FactorStatus.SUCCESS)


def test_factor_idempotent_reuse():
    """Repeated factor/solve reuse (reference: lqr_test.cpp:431-450)."""
    rng = np.random.default_rng(8)
    data = make_chain_problem(rng, 2, 1, 4)
    sched = compile_topology(Topology.chain(4))
    @jax.jit
    def go(d):
        fact = lqr_factor(d, sched)
        s1 = lqr_solve(d, fact, sched)
        s2 = lqr_solve(d, fact, sched)
        return s1, s2, lqr_residual_norm(d, s2, sched)

    s1, s2, res = go(data)
    np.testing.assert_array_equal(np.asarray(s1.x), np.asarray(s2.x))
    assert float(res) < 1e-12


def test_jit_compiles():
    rng = np.random.default_rng(9)
    T = 10
    data = make_chain_problem(rng, 4, 2, T)
    sched = compile_topology(Topology.chain(T))
    sol, status, res = run_solve(data, sched)
    assert float(res) < 1e-11


def test_deep_path_tree_level_scan():
    """Depth-63 heterogeneous path (the reference's heterogeneous_path
    benchmark shape, reference: lqr_benchmark.cpp:209-271): selects the
    lax.scan level backend (O(1) program size in depth) and matches both
    the residual oracle and the unrolled level loop."""
    from sip_optimal_control_tpu.ops.lqr import (_factor_tree, _solve_tree,
                                                 use_level_scan)
    rng = np.random.default_rng(11)
    T = 63
    topo = Topology.tree(0, list(range(T)), list(range(1, T + 1)))
    sched = compile_topology(topo)
    assert use_level_scan(sched)
    data = make_tree_problem(rng, topo, n=3, m=2)
    sol, status, res = run_solve(data, sched)   # dispatches to level scan
    assert int(status) == FactorStatus.SUCCESS
    assert float(res) < 1e-12
    fact_u = _factor_tree(data, sched)
    sol_u = _solve_tree(data, fact_u, sched)
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(sol_u.x),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(sol.u), np.asarray(sol_u.u),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(sol.y), np.asarray(sol_u.y),
                               atol=1e-10)


def test_deep_random_tree_level_scan_matches_dense():
    """Irregular deep tree (ragged level widths exercise the padded
    gather/scatter): level-scan backend vs the dense-KKT oracle."""
    from sip_optimal_control_tpu.ops.lqr import use_level_scan
    rng = np.random.default_rng(12)
    N = 40
    parents = [int(rng.integers(max(0, ch - 2), ch)) for ch in range(1, N)]
    topo = Topology.tree(0, parents, list(range(1, N)))
    sched = compile_topology(topo)
    assert use_level_scan(sched)
    data = make_tree_problem(rng, topo, n=2, m=2)
    sol, status, res = run_solve(data, sched)
    assert int(status) == FactorStatus.SUCCESS
    assert float(res) < 1e-12
    x, u, y = dense_kkt_solve(data, topo)
    np.testing.assert_allclose(np.asarray(sol.x), x, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sol.u), u, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sol.y), y, atol=1e-10)


def test_deep_path_failure_status_level_scan():
    """Failure statuses propagate out of the scan backend identically to
    the unrolled level loop (padded lanes must not fabricate or mask
    failures)."""
    from sip_optimal_control_tpu.ops.lqr import _factor_tree
    rng = np.random.default_rng(13)
    T = 40
    topo = Topology.tree(0, list(range(T)), list(range(1, T + 1)))
    sched = compile_topology(topo)
    data = make_tree_problem(rng, topo, n=2, m=1)
    # indefinite R mid-path: the recursion breaks somewhere upstream
    bad = dataclasses.replace(
        data, R=data.R.at[T // 2].set(jnp.asarray([[-5.0]])))
    status = int(jax.jit(lambda d: lqr_factor(d, sched).status)(bad))
    status_unrolled = int(_factor_tree(bad, sched).status)
    assert status == status_unrolled != FactorStatus.SUCCESS
    # and an invalid delta on a mid-path node is classified identically too
    bad2 = dataclasses.replace(data, delta=data.delta.at[T // 2, 0].set(0.0))
    s2 = int(jax.jit(lambda d: lqr_factor(d, sched).status)(bad2))
    assert s2 == int(_factor_tree(bad2, sched).status)
    assert s2 == FactorStatus.INVALID_DELTA


def test_deep_path_variable_dims_level_scan():
    """Variable stage dims (padding + masking) through the level-scan
    backend: a depth-20 path with ragged state/control dims must match the
    dense solve of the padded system and keep dead entries exactly zero."""
    from sip_optimal_control_tpu.ops.lqr import use_level_scan
    rng = np.random.default_rng(14)
    T = 20
    topo = Topology.tree(0, list(range(T)), list(range(1, T + 1)))
    sched = compile_topology(topo)
    assert use_level_scan(sched)
    state_dims = tuple(int(d) for d in rng.integers(1, 4, T + 1))
    control_dims = tuple(int(d) for d in rng.integers(1, 3, T))
    dims = Dimensions(theta_dim=0, state_dims=state_dims,
                      control_dims=control_dims,
                      node_c_dims=(0,) * (T + 1), node_g_dims=(0,) * (T + 1),
                      edge_c_dims=(0,) * T, edge_g_dims=(0,) * T)
    data = make_tree_problem(rng, topo, n=3, m=2)
    padded = jax.jit(lambda d: pad_lqr_data(d, dims, sched))(data)
    sol, status, res = run_solve(padded, sched)
    assert int(status) == FactorStatus.SUCCESS
    assert float(res) < 1e-12
    for i, d in enumerate(state_dims):
        assert np.all(np.asarray(sol.x)[i, d:] == 0.0)
    for e, d in enumerate(control_dims):
        assert np.all(np.asarray(sol.u)[e, d:] == 0.0)
    x, u, y = dense_kkt_solve(padded, topo)
    np.testing.assert_allclose(np.asarray(sol.x), x, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sol.u), u, atol=1e-10)
