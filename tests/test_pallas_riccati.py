"""Pallas fused-Riccati backend tests (interpret mode on CPU).

The kernel must reproduce the scan backend's factorization products and
solutions on f32 data under vmap (the solver's scenario axis), fall back
cleanly when unsupported (f64 / unbatched), and propagate failure statuses
per scenario."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from sip_optimal_control_tpu import FactorStatus, Topology, compile_topology
from sip_optimal_control_tpu.ops.lqr import (LQRData, lqr_factor,
                                             lqr_factor_solve,
                                             lqr_residual_norm, lqr_solve)


def random_chain_f32(T, n, m, rng, batch):
    def spd(c, d, base):
        s = 0.3 * rng.standard_normal((c, d, d))
        return (s @ np.swapaxes(s, -1, -2)
                + base * np.eye(d)).astype(np.float32)

    def r32(*sh):
        return rng.standard_normal(sh).astype(np.float32)

    def stack(f):
        return jnp.asarray(np.stack([f() for _ in range(batch)]))

    return LQRData(
        Q=stack(lambda: spd(T + 1, n, 2.0)),
        q=stack(lambda: r32(T + 1, n)),
        c=stack(lambda: r32(T + 1, n)),
        delta=stack(lambda: (0.5 + rng.random((T + 1, n))
                             ).astype(np.float32)),
        A=stack(lambda: 0.4 * r32(T, n, n)),
        B=stack(lambda: 0.5 * r32(T, n, m)),
        M=stack(lambda: 0.1 * r32(T, n, m)),
        R=stack(lambda: spd(T, m, 2.0)),
        r=stack(lambda: r32(T, m)))


def test_pallas_factor_matches_scan_under_vmap():
    rng = np.random.default_rng(0)
    T, n, m, B = 5, 3, 2, 4          # batch padded to 1024 inside
    sched = compile_topology(Topology.chain(T))
    data = random_chain_f32(T, n, m, rng, B)

    f_scan = jax.vmap(lambda d: lqr_factor(d, sched))(data)
    f_pal = jax.jit(jax.vmap(
        lambda d: lqr_factor(d, sched, backend="pallas")))(data)
    assert np.all(np.asarray(f_pal.status) == FactorStatus.SUCCESS)
    for name in ("V", "W", "K", "G_chol", "F_chol"):
        np.testing.assert_allclose(
            np.asarray(getattr(f_pal, name)),
            np.asarray(getattr(f_scan, name)), rtol=2e-4, atol=2e-4,
            err_msg=name)


def test_pallas_factor_solve_end_to_end():
    rng = np.random.default_rng(1)
    T, n, m, B = 8, 4, 1, 3
    sched = compile_topology(Topology.chain(T))
    data = random_chain_f32(T, n, m, rng, B)

    sols, stats = jax.jit(jax.vmap(
        lambda d: lqr_factor_solve(d, sched, backend="pallas")))(data)
    assert np.all(np.asarray(stats) == FactorStatus.SUCCESS)
    resid = jax.vmap(lambda d, s: lqr_residual_norm(d, s, sched))(data, sols)
    # f32 recursion; residual is small relative to O(1) data
    assert float(jnp.max(resid)) < 5e-4, float(jnp.max(resid))

    sols_ref, _ = jax.vmap(lambda d: lqr_factor_solve(d, sched))(data)
    np.testing.assert_allclose(np.asarray(sols.x), np.asarray(sols_ref.x),
                               rtol=2e-3, atol=2e-3)


def test_pallas_per_scenario_failure_status():
    rng = np.random.default_rng(2)
    T, n, m, B = 4, 3, 1, 3
    sched = compile_topology(Topology.chain(T))
    data = random_chain_f32(T, n, m, rng, B)
    # scenario 1 gets a non-PD R at one stage -> G failure for it only
    R_bad = data.R.at[1, 2].set(-jnp.eye(m, dtype=jnp.float32))
    data = dataclasses.replace(data, R=R_bad)
    f = jax.vmap(lambda d: lqr_factor(d, sched, backend="pallas"))(data)
    stats = np.asarray(f.status)
    assert stats[0] == FactorStatus.SUCCESS
    assert stats[1] != FactorStatus.SUCCESS
    assert stats[2] == FactorStatus.SUCCESS


def test_pallas_unbatched_and_f64_fall_back():
    rng = np.random.default_rng(3)
    T, n, m = 4, 3, 1
    sched = compile_topology(Topology.chain(T))
    data32 = jax.tree.map(lambda a: a[0], random_chain_f32(T, n, m, rng, 1))
    # unbatched direct call -> scan fallback, still correct
    sol, st = lqr_factor_solve(data32, sched, backend="pallas")
    assert int(st) == FactorStatus.SUCCESS
    assert float(lqr_residual_norm(data32, sol, sched)) < 5e-4
    # f64 batched -> vmap(scan) fallback, full fp64 accuracy
    data64 = jax.tree.map(lambda a: jnp.stack([a, a]).astype(jnp.float64),
                          data32)
    sols, sts = jax.vmap(
        lambda d: lqr_factor_solve(d, sched, backend="pallas"))(data64)
    resid = jax.vmap(lambda d, s: lqr_residual_norm(d, s, sched))(data64,
                                                                  sols)
    assert float(jnp.max(resid)) < 1e-10


def test_pallas_gram_kernel_large_n_matches_scan():
    """n >= _GRAM_N dispatches the Gram-form factor kernel (no explicit
    F_inv/W/WA in-kernel; W recomputed in one batched pass outside) — it
    must reproduce the scan backend's products and solutions at the
    reference grid's top end (n=16, m=4)."""
    from sip_optimal_control_tpu.ops.pallas_riccati import _GRAM_N
    rng = np.random.default_rng(5)
    T, n, m, B = 6, 16, 4, 3
    assert n >= _GRAM_N
    sched = compile_topology(Topology.chain(T))
    data = random_chain_f32(T, n, m, rng, B)

    f_scan = jax.vmap(lambda d: lqr_factor(d, sched))(data)
    f_pal = jax.jit(jax.vmap(
        lambda d: lqr_factor(d, sched, backend="pallas")))(data)
    assert np.all(np.asarray(f_pal.status) == FactorStatus.SUCCESS)
    for name in ("V", "W", "K", "G_chol", "F_chol"):
        np.testing.assert_allclose(
            np.asarray(getattr(f_pal, name)),
            np.asarray(getattr(f_scan, name)), rtol=5e-4, atol=5e-4,
            err_msg=name)

    sols, stats = jax.jit(jax.vmap(
        lambda d: lqr_factor_solve(d, sched, backend="pallas")))(data)
    assert np.all(np.asarray(stats) == FactorStatus.SUCCESS)
    sols_ref, _ = jax.vmap(lambda d: lqr_factor_solve(d, sched))(data)
    np.testing.assert_allclose(np.asarray(sols.x), np.asarray(sols_ref.x),
                               rtol=5e-3, atol=5e-3)
