"""Parallel-in-time (associative-scan) Riccati tests.

Checks, in order of increasing integration: (1) the element combination
rule against direct Schur elimination of the middle state, (2) factor
products against the sequential recursion, (3) solutions against the
sequential solve and the KKT residual oracle (the reference's test pattern,
reference: tests/lqr_test.cpp:152-186), (4) vmap batching, (5) failure
statuses."""

import numpy as np
import jax
import jax.numpy as jnp

from sip_optimal_control_tpu import FactorStatus, Topology, compile_topology
from sip_optimal_control_tpu.ops.lqr import (LQRData, _chain_elements,
                                             _combine_elems, _QuadElem,
                                             lqr_factor, lqr_factor_solve,
                                             lqr_residual_norm, lqr_solve)


def random_chain(T, n, m, rng, delta_scale=1.0):
    def spd(count, d, base):
        s = 0.3 * rng.standard_normal((count, d, d))
        return s @ np.swapaxes(s, -1, -2) + base * np.eye(d)

    return LQRData(
        Q=jnp.asarray(spd(T + 1, n, 2.0)),
        q=jnp.asarray(rng.standard_normal((T + 1, n))),
        c=jnp.asarray(rng.standard_normal((T + 1, n))),
        delta=jnp.asarray(delta_scale * (0.5 + rng.random((T + 1, n)))),
        A=jnp.asarray(0.5 * rng.standard_normal((T, n, n))),
        B=jnp.asarray(0.5 * rng.standard_normal((T, n, m))),
        M=jnp.asarray(0.1 * rng.standard_normal((T, n, m))),
        R=jnp.asarray(spd(T, m, 2.0)),
        r=jnp.asarray(rng.standard_normal((T, m))))


def elem_quadratic_form(e, n):
    """The element as an explicit quadratic in (x_L, x_R):
    1/2 x_L^T J x_L + eta^T x_L + 1/2 (x_R - A x_L - b)^T C^{-1} (...)."""
    A, b, C, eta, J = (np.asarray(t) for t in e)
    Ci = np.linalg.inv(C)
    H = np.zeros((2 * n, 2 * n))
    H[:n, :n] = J + A.T @ Ci @ A
    H[:n, n:] = -A.T @ Ci
    H[n:, :n] = -Ci @ A
    H[n:, n:] = Ci
    lin = np.concatenate([eta + A.T @ Ci @ b, -Ci @ b])
    return H, lin


def test_combine_matches_schur_elimination():
    """combine(eL, eR) must equal eliminating the shared middle state from
    the sum of the two elements' quadratic forms."""
    rng = np.random.default_rng(0)
    n = 3

    def rand_elem():
        s = rng.standard_normal((n, n))
        sC = rng.standard_normal((n, n))
        return _QuadElem(
            A=jnp.asarray(0.7 * rng.standard_normal((n, n))),
            b=jnp.asarray(rng.standard_normal(n)),
            C=jnp.asarray(sC @ sC.T + 0.5 * np.eye(n)),
            eta=jnp.asarray(rng.standard_normal(n)),
            J=jnp.asarray(s @ s.T + 0.8 * np.eye(n)))

    eL, eR = rand_elem(), rand_elem()
    eC = _combine_elems(eL, eR)

    # oracle: build the 3n x 3n quadratic in (x_i, x_j, x_k), Schur-eliminate
    # the middle block, compare with the combined element's form.
    HL, lL = elem_quadratic_form(eL, n)      # over (x_i, x_j)
    HR, lR = elem_quadratic_form(eR, n)      # over (x_j, x_k)
    H = np.zeros((3 * n, 3 * n))
    lin = np.zeros(3 * n)
    H[:2 * n, :2 * n] += HL
    H[n:, n:] += HR
    lin[:2 * n] += lL
    lin[n:] += lR
    # eliminate x_j (indices n:2n)
    idx_keep = np.r_[0:n, 2 * n:3 * n]
    idx_mid = np.r_[n:2 * n]
    Hkk = H[np.ix_(idx_keep, idx_keep)]
    Hkm = H[np.ix_(idx_keep, idx_mid)]
    Hmm = H[np.ix_(idx_mid, idx_mid)]
    Hs = Hkk - Hkm @ np.linalg.solve(Hmm, Hkm.T)
    ls = lin[idx_keep] - Hkm @ np.linalg.solve(Hmm, lin[idx_mid])

    Hc, lc = elem_quadratic_form(eC, n)
    np.testing.assert_allclose(Hc, Hs, atol=1e-10)
    np.testing.assert_allclose(lc, ls, atol=1e-10)


def test_elements_reproduce_sequential_value_map():
    """Applying one edge element to the child's (V, v) must reproduce one
    step of the sequential backward recursion."""
    rng = np.random.default_rng(1)
    T, n, m = 4, 3, 2
    data = random_chain(T, n, m, rng)
    sched = compile_topology(Topology.chain(T))
    fact_seq = lqr_factor(data, sched)

    elems, _, ok = _chain_elements(data)
    assert bool(ok)
    # V_{T-1} = J_{T-1} + A^T (I + V_T C)^{-1} V_T A with (V_T = Q_T)
    e = jax.tree.map(lambda a: a[T - 1], elems)
    V_T = np.asarray(data.Q[T])
    A, b, C, eta, J = (np.asarray(t) for t in e)
    V_pred = J + A.T @ np.linalg.solve(np.eye(n) + V_T @ C, V_T @ A)
    np.testing.assert_allclose(V_pred, np.asarray(fact_seq.V[T - 1]),
                               atol=1e-10)


def test_parallel_factor_matches_sequential():
    rng = np.random.default_rng(2)
    T, n, m = 12, 4, 2
    data = random_chain(T, n, m, rng)
    sched = compile_topology(Topology.chain(T))
    f_seq = jax.jit(lambda d: lqr_factor(d, sched))(data)
    f_par = jax.jit(lambda d: lqr_factor(d, sched, backend="assoc"))(
        data)
    assert int(f_par.status) == FactorStatus.SUCCESS
    np.testing.assert_allclose(np.asarray(f_par.V), np.asarray(f_seq.V),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(f_par.K), np.asarray(f_seq.K),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(f_par.W), np.asarray(f_seq.W),
                               rtol=1e-8, atol=1e-8)


def test_parallel_solve_matches_sequential_and_residual():
    rng = np.random.default_rng(3)
    for T, n, m in ((6, 3, 1), (33, 4, 2), (64, 6, 3)):
        data = random_chain(T, n, m, rng)
        sched = compile_topology(Topology.chain(T))
        sol_seq, st_seq = jax.jit(
            lambda d: lqr_factor_solve(d, sched))(data)
        sol_par, st_par = jax.jit(
            lambda d: lqr_factor_solve(d, sched, backend="assoc"))(data)
        assert int(st_par) == FactorStatus.SUCCESS
        np.testing.assert_allclose(np.asarray(sol_par.x),
                                   np.asarray(sol_seq.x), atol=1e-7)
        np.testing.assert_allclose(np.asarray(sol_par.u),
                                   np.asarray(sol_seq.u), atol=1e-7)
        np.testing.assert_allclose(np.asarray(sol_par.y),
                                   np.asarray(sol_seq.y), atol=1e-7)
        resid = float(lqr_residual_norm(data, sol_par, sched))
        assert resid < 1e-9, resid


def test_mixed_paths_share_factorization():
    """Sequential solve on a parallel factorization and vice versa."""
    rng = np.random.default_rng(4)
    T, n, m = 10, 3, 2
    data = random_chain(T, n, m, rng)
    sched = compile_topology(Topology.chain(T))
    f_par = jax.jit(lambda d: lqr_factor(d, sched, backend="assoc"))(
        data)
    sol = jax.jit(lambda d, f: lqr_solve(d, f, sched))(
        data, f_par)                                 # sequential solve
    assert float(lqr_residual_norm(data, sol, sched)) < 1e-9
    f_seq = jax.jit(lambda d: lqr_factor(d, sched))(data)
    sol2 = jax.jit(
        lambda d, f: lqr_solve(d, f, sched, backend="assoc"))(
            data, f_seq)
    assert float(lqr_residual_norm(data, sol2, sched)) < 1e-9


def test_parallel_vmap_batching():
    rng = np.random.default_rng(5)
    T, n, m, B = 16, 4, 2, 3
    sched = compile_topology(Topology.chain(T))
    datas = [random_chain(T, n, m, rng) for _ in range(B)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)
    jfs = jax.jit(lambda d: lqr_factor_solve(d, sched, backend="assoc"))
    sols, stats = jax.jit(jax.vmap(jfs))(batch)
    for i in range(B):
        sol_i, _ = jfs(datas[i])
        np.testing.assert_allclose(np.asarray(sols.x[i]),
                                   np.asarray(sol_i.x), atol=1e-9)
    assert np.all(np.asarray(stats) == FactorStatus.SUCCESS)


def test_parallel_failure_statuses():
    rng = np.random.default_rng(6)
    T, n, m = 5, 3, 2
    data = random_chain(T, n, m, rng)
    sched = compile_topology(Topology.chain(T))
    # non-SPD R -> the parallel path's stricter requirement trips
    import dataclasses
    bad_R = dataclasses.replace(
        data, R=data.R.at[2].set(-jnp.eye(m)))
    jf = jax.jit(lambda d: lqr_factor(d, sched, backend="assoc"))
    f = jf(bad_R)
    assert int(f.status) == FactorStatus.G_FACTORIZATION_FAILURE
    # invalid delta propagates (reference: lqr.cpp:722-727)
    bad_d = dataclasses.replace(data, delta=data.delta.at[1, 0].set(-1.0))
    f = jf(bad_d)
    assert int(f.status) != FactorStatus.SUCCESS


def test_full_sip_solve_with_parallel_riccati():
    """End-to-end IPM with the associative-scan Riccati inside: same
    solution as the sequential path on a bounded double integrator."""
    from sip_optimal_control_tpu import (Dimensions, Settings, Topology,
                                         box_bounds, build_problem, solve)
    from sip_optimal_control_tpu.models import double_integrator

    spec, dims, topo = double_integrator(horizon=12)
    lower, upper = box_bounds(dims, u_lower=-0.6, u_upper=0.6)
    x0 = jnp.asarray([1.0, 0.0])
    problem = build_problem(spec, dims, topo, initial_state=x0,
                            lower=lower, upper=upper)
    res_seq = jax.jit(lambda: solve(problem, Settings(
        max_iterations=40)))()
    res_par = jax.jit(lambda: solve(problem, Settings(
        max_iterations=40, riccati_backend="assoc")))()
    assert int(res_seq.status) == 0 and int(res_par.status) == 0
    np.testing.assert_allclose(np.asarray(res_par.vars.u),
                               np.asarray(res_seq.vars.u), atol=1e-6)
